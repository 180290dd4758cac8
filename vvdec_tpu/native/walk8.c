/* walk8.c — native motion-candidate derivation (regular merge + AMVP).
 *
 * Mirrors frame/inter_np.py derive_merge / fill_mvp (reference
 * UnitTools.cpp:PU::getInterMergeCandidates / PU::fillMvpCand,
 * PU::getColocatedMVP UnitTools.cpp:1410) over the flat CU records and
 * the numpy motion-field planes; the Python plane keeps orchestration
 * (MC, DMVR/BDOF, affine/GPM/IBC) and the HMVP writer.  Included from
 * cabac.c.
 */

#define MC_MAX_REF 17
#define MC_HMVP 5
#define MC_HMVP_AMVP 4
#define MC_ENT 9 /* dir, mv0x, mv0y, mv1x, mv1y, ref0, ref1, bcw, alt */

/* slice-table columns (int32 [n_slices, SLT_NF]) */
enum {
    SLT_IS_B, SLT_N_ACT0, SLT_N_ACT1, SLT_COL_IDX, SLT_COL_FROM_L0,
    SLT_NF
};

typedef struct {
    const int8_t *ref_idx; /* [h8, w8, 2] */
    const int32_t *mv;     /* [h8, w8, 2, 2] */
    int32_t poc;
    int32_t ref_pocs[2][MC_MAX_REF];
    int w8, h8;
    Py_buffer b_ref, b_mv;
} MCol;

typedef struct {
    PyObject_HEAD
    Py_buffer b_cu_rec, b_cu_map, b_mi_ref, b_mi_mv, b_side, b_hist,
        b_hist_n, b_slice_tab, b_ref_pocs;
    const int32_t *cu_rec;
    const int32_t *cu_map;
    const int8_t *mi_ref;  /* [h4, w4, 2] */
    const int32_t *mi_mv;  /* [h4, w4, 2, 2] */
    const int32_t *side;   /* [n_cu, 2] (bcw, imv) — updated by Python */
    const int32_t *hist;   /* [MC_HMVP, MC_ENT], oldest first */
    const int32_t *hist_n; /* [1] */
    const int32_t *slice_tab;
    const int32_t *ref_pocs; /* [2, MC_MAX_REF] */
    int n_cu, w, h, w4, h4, ctu_log2, wpp;
    int max_merge, tmvp_en, check_ldc, poc;
    MCol *cols;
    int n_cols;
} MotionCtx;

#define MC_CU(mc, i) ((mc)->cu_rec + (size_t)(i) * CU_NF)

/* ---- neighbor / motion-field queries ---- */

/* inter neighbor CU index (inter_np._nb: getCURestricted + isInter) */
static int mc_nb(const MotionCtx *mc, int cur_idx, int x, int y)
{
    if (x < 0 || y < 0 || x >= mc->w || y >= mc->h)
        return -1;
    int nb = mc->cu_map[(size_t)(y >> 2) * mc->w4 + (x >> 2)];
    if (nb < 0)
        return -1;
    const int32_t *cr = MC_CU(mc, nb), *cu = MC_CU(mc, cur_idx);
    if (cr[CU_SLICE_IDX] != cu[CU_SLICE_IDX]
        || cr[CU_TILE_IDX] != cu[CU_TILE_IDX])
        return -1;
    int sh = mc->ctu_log2;
    int xdiff = (x >> sh) - (cu[CU_X] >> sh);
    int ydiff = (y >> sh) - (cu[CU_Y] >> sh);
    if (ydiff == 0 && xdiff == 0) {
        if (nb > cur_idx)
            return -1;
    } else if (ydiff > 0 || (ydiff == 0 && xdiff > 0)
               || xdiff > (mc->wpp ? 0 : 1)) {
        return -1;
    }
    if (cr[CU_PRED_MODE] != 0 /* MODE_INTER */ || nb >= cur_idx)
        return -1;
    return nb;
}

/* motion info at a 4x4 position (inter_np.mi_at): e = (dir, mv0, mv1,
 * r0, r1, bcw, alt); bcw/alt from the owning CU's derived side table */
static void mc_mi_at(const MotionCtx *mc, int nb, int x, int y,
                     int32_t e[MC_ENT])
{
    size_t p = (size_t)(y >> 2) * mc->w4 + (x >> 2);
    int r0 = mc->mi_ref[p * 2], r1 = mc->mi_ref[p * 2 + 1];
    e[0] = (r0 >= 0 ? 1 : 0) + (r1 >= 0 ? 2 : 0);
    e[1] = mc->mi_mv[p * 4];
    e[2] = mc->mi_mv[p * 4 + 1];
    e[3] = mc->mi_mv[p * 4 + 2];
    e[4] = mc->mi_mv[p * 4 + 3];
    e[5] = r0;
    e[6] = r1;
    e[7] = nb >= 0 ? mc->side[(size_t)nb * 2] : 0;
    e[8] = nb >= 0 ? (mc->side[(size_t)nb * 2 + 1] == 3) : 0;
}

/* MotionInfo operator== (inter_np._mi_eq) on MC_ENT rows */
static int mc_mi_eq(const int32_t *a, const int32_t *b)
{
    if (a[5] != b[5] || a[6] != b[6])
        return 0;
    if (a[5] >= 0 && (a[1] != b[1] || a[2] != b[2]))
        return 0;
    if (a[6] >= 0 && (a[3] != b[3] || a[4] != b[4]))
        return 0;
    return 1;
}

/* ---- temporal MVP ---- */

/* 18-bit MV compression round trip (inter_np._round_mv_comp) */
static int32_t mc_round_mv_comp(int32_t v)
{
    int32_t sign = v < 0 ? -1 : 0;
    uint32_t u = (uint32_t)(v ^ sign) | 31u;
    int bl = 32 - __builtin_clz(u); /* bit_length */
    int scale = bl - 1 - 5;
    if (scale < -1)
        scale = -1;
    int32_t exponent, mantissa;
    if (scale >= 0) {
        int32_t rnd = (1 << scale) >> 1;
        int32_t n = (v + rnd) >> scale;
        exponent = scale + ((n ^ sign) >> 5);
        mantissa = (n & 31) | (sign * 32);
    } else {
        exponent = 0;
        mantissa = v;
    }
    if (exponent == 0)
        return mantissa;
    return (mantissa ^ 32) * (1 << (exponent - 1));
}

static int32_t mc_cdiv(int32_t a, int32_t b)
{
    int32_t q = (a < 0 ? -a : a) / (b < 0 ? -b : b);
    return ((a < 0) != (b < 0)) ? -q : q;
}

static int32_t mc_dist_scale(int cur_poc, int cur_ref_poc, int col_poc,
                             int col_ref_poc)
{
    int dd = col_poc - col_ref_poc;
    int db = cur_poc - cur_ref_poc;
    if (dd == db)
        return 4096;
    int tdb = db < -128 ? -128 : (db > 127 ? 127 : db);
    int tdd = dd < -128 ? -128 : (dd > 127 ? 127 : dd);
    int32_t half = mc_cdiv(tdd, 2);
    int32_t ix = mc_cdiv(0x4000 + (half < 0 ? -half : half), tdd);
    int32_t s = (tdb * ix + 32) >> 6;
    return s < -4096 ? -4096 : (s > 4095 ? 4095 : s);
}

static int32_t mc_scale_comp(int32_t scale, int32_t v)
{
    int64_t p = (int64_t)scale * v;
    int64_t r = (p + 128 - (p >= 0)) >> 8;
    return r < -131072 ? -131072 : (r > 131071 ? (int32_t)131071
                                               : (int32_t)r);
}

/* PU::getColocatedMVP (inter_np.get_colocated_mvp, sb_flag=0).
 * Returns 1 and fills mv_out on success. */
static int mc_col_mvp(const MotionCtx *mc, const int32_t *slt, int lst,
                      int px, int py, int ref_idx, int32_t mv_out[2])
{
    int ci = slt[SLT_COL_IDX];
    if (ci < 0 || ci >= mc->n_cols)
        return 0;
    const MCol *col = &mc->cols[ci];
    if (px >= mc->w || py >= mc->h || px < 0 || py < 0)
        return 0;
    int x8 = px >> 3, y8 = py >> 3;
    size_t p = (size_t)y8 * col->w8 + x8;
    int e_col = mc->check_ldc ? lst : slt[SLT_COL_FROM_L0];
    if (col->ref_idx[p * 2] < 0 && col->ref_idx[p * 2 + 1] < 0)
        return 0;
    int col_ref = col->ref_idx[p * 2 + e_col];
    if (col_ref < 0) {
        e_col = 1 - e_col;
        col_ref = col->ref_idx[p * 2 + e_col];
        if (col_ref < 0)
            return 0;
    }
    int32_t mx = mc_round_mv_comp(col->mv[p * 4 + e_col * 2]);
    int32_t my = mc_round_mv_comp(col->mv[p * 4 + e_col * 2 + 1]);
    int cur_ref_poc = mc->ref_pocs[(size_t)lst * MC_MAX_REF + ref_idx];
    int col_ref_poc = col->ref_pocs[e_col][col_ref];
    int32_t scale = mc_dist_scale(mc->poc, cur_ref_poc, col->poc,
                                  col_ref_poc);
    if (scale == 4096) {
        mv_out[0] = mx < -131072 ? -131072 : (mx > 131071 ? 131071 : mx);
        mv_out[1] = my < -131072 ? -131072 : (my > 131071 ? 131071 : my);
    } else {
        mv_out[0] = mc_scale_comp(scale, mx);
        mv_out[1] = mc_scale_comp(scale, my);
    }
    return 1;
}

/* (c0_avail, posC0, posC1) — inter_np.tmvp_positions */
static void mc_tmvp_pos(const MotionCtx *mc, const int32_t *cu,
                        int *c0_avail, int pos_c0[2], int pos_c1[2])
{
    int ctu = 1 << mc->ctu_log2;
    int rbx = cu[CU_X] + cu[CU_W] - 1 - 3;
    int rby = cu[CU_Y] + cu[CU_H] - 1 - 3;
    int boundary = (rbx + 4 < mc->w) && (rby + 4 < mc->h);
    *c0_avail = boundary && ((rby & (ctu - 1)) + 4 < ctu);
    pos_c0[0] = rbx + 4;
    pos_c0[1] = rby + 4;
    pos_c1[0] = cu[CU_X] + (cu[CU_W] >> 1);
    pos_c1[1] = cu[CU_Y] + (cu[CU_H] >> 1);
}

/* ---- regular merge list (inter_np.derive_merge) ---- */

/* core: regular merge list into out [max_merge, MC_ENT]; returns count */
static int mc_merge_core(MotionCtx *self, int idx, int32_t *out)
{
    const int32_t *cu = MC_CU(self, idx);
    const int32_t *slt = self->slice_tab
        + (size_t)cu[CU_SLICE_IDX] * SLT_NF;
    int is_b = slt[SLT_IS_B];
    int max_cand = self->max_merge;
    int x = cu[CU_X], y = cu[CU_Y], w = cu[CU_W], h = cu[CU_H];
    int n = 0;

#define MI_OF(nbv, nx, ny, dst)                                          \
    do {                                                                 \
        mc_mi_at(self, (nbv), (nx), (ny), (dst));                        \
        if ((dst)[0] != 3)                                               \
            (dst)[7] = 0;                                                \
    } while (0)
#define ADD(src)                                                         \
    do {                                                                 \
        memcpy(out + (size_t)n * MC_ENT, (src),                          \
               MC_ENT * sizeof(int32_t));                                \
        n++;                                                             \
    } while (0)
#define DONE() return n

    int32_t mi_b1[MC_ENT], mi_a1[MC_ENT], tmp[MC_ENT];
    int has_b1 = 0, has_a1 = 0;
    int b1 = mc_nb(self, idx, x + w - 1, y - 1);
    if (b1 >= 0) {
        MI_OF(b1, x + w - 1, y - 1, mi_b1);
        has_b1 = 1;
        ADD(mi_b1);
    }
    if (n == max_cand)
        DONE();
    int a1 = mc_nb(self, idx, x - 1, y + h - 1);
    if (a1 >= 0) {
        MI_OF(a1, x - 1, y + h - 1, mi_a1);
        has_a1 = 1;
        if (!has_b1 || !mc_mi_eq(mi_a1, mi_b1))
            ADD(mi_a1);
    }
    if (n == max_cand)
        DONE();
    int spatial_cnt_pos = n;
    int b0 = mc_nb(self, idx, x + w, y - 1);
    if (b0 >= 0) {
        MI_OF(b0, x + w, y - 1, tmp);
        if (!has_b1 || !mc_mi_eq(tmp, mi_b1))
            ADD(tmp);
        if (n == max_cand)
            DONE();
    }
    int a0 = mc_nb(self, idx, x - 1, y + h);
    if (a0 >= 0) {
        MI_OF(a0, x - 1, y + h, tmp);
        if (!has_a1 || !mc_mi_eq(tmp, mi_a1))
            ADD(tmp);
        if (n == max_cand)
            DONE();
    }
    if (n < 4) {
        int b2 = mc_nb(self, idx, x - 1, y - 1);
        if (b2 >= 0) {
            MI_OF(b2, x - 1, y - 1, tmp);
            if ((!has_a1 || !mc_mi_eq(tmp, mi_a1))
                && (!has_b1 || !mc_mi_eq(tmp, mi_b1)))
                ADD(tmp);
        }
        if (n == max_cand)
            DONE();
    }

    /* TMVP */
    if (self->tmvp_en && (w + h > 12)) {
        int c0_avail, p0[2], p1[2];
        mc_tmvp_pos(self, cu, &c0_avail, p0, p1);
        int32_t mv0[2] = {0, 0}, mv1[2] = {0, 0};
        int d = 0;
        if ((c0_avail && mc_col_mvp(self, slt, 0, p0[0], p0[1], 0, mv0))
            || mc_col_mvp(self, slt, 0, p1[0], p1[1], 0, mv0))
            d |= 1;
        if (is_b
            && ((c0_avail
                 && mc_col_mvp(self, slt, 1, p0[0], p0[1], 0, mv1))
                || mc_col_mvp(self, slt, 1, p1[0], p1[1], 0, mv1)))
            d |= 2;
        if (d) {
            int32_t c[MC_ENT] = {d, mv0[0], mv0[1], mv1[0], mv1[1],
                                 (d & 1) ? 0 : -1, (d & 2) ? 0 : -1,
                                 0, 0};
            ADD(c);
            if (n == max_cand)
                DONE();
        }
    }

    /* HMVP, newest first, pruned vs the first spatial candidates */
    if (n != max_cand - 1) {
        int pruned[8] = {0};
        int hn = self->hist_n[0];
        for (int k = 0; k < hn; k++) {
            const int32_t *e = self->hist
                + (size_t)(hn - 1 - k) * MC_ENT;
            int32_t cand[MC_ENT];
            if (is_b) {
                memcpy(cand, e, MC_ENT * sizeof(int32_t));
            } else {
                cand[0] = 1;
                cand[1] = e[1];
                cand[2] = e[2];
                cand[3] = 0;
                cand[4] = 0;
                cand[5] = e[5];
                cand[6] = -1;
                cand[7] = 0;
                cand[8] = e[8];
            }
            if (cand[0] != 3)
                cand[7] = 0;
            int sim = 0;
            if (k + 1 <= 2) {
                for (int ui = 0; ui < spatial_cnt_pos; ui++) {
                    if (pruned[ui])
                        continue;
                    const int32_t *c = out + (size_t)ui * MC_ENT;
                    if (c[0] != cand[0])
                        continue;
                    int same;
                    if (c[0] == 3)
                        same = c[1] == cand[1] && c[2] == cand[2]
                            && c[3] == cand[3] && c[4] == cand[4]
                            && c[5] == cand[5] && c[6] == cand[6];
                    else {
                        int lst = c[0] - 1;
                        same = c[1 + 2 * lst] == cand[1 + 2 * lst]
                            && c[2 + 2 * lst] == cand[2 + 2 * lst]
                            && c[5 + lst] == cand[5 + lst];
                    }
                    if (same) {
                        pruned[ui] = 1;
                        sim = 1;
                        break;
                    }
                }
            }
            if (k + 1 > 2 || !sim) {
                ADD(cand);
                if (n == max_cand - 1)
                    break;
            }
        }
    }

    /* pairwise average of the first two candidates */
    if (n > 1 && n < max_cand) {
        const int32_t *c0 = out, *c1 = out + MC_ENT;
        int inter_dir = 0;
        int32_t mv_out[2][2] = {{0, 0}, {0, 0}};
        int32_t ref_out[2] = {-1, -1};
        for (int lst = 0; lst < (is_b ? 2 : 1); lst++) {
            int ri = c0[5 + lst], rj = c1[5 + lst];
            if (ri < 0 && rj < 0)
                continue;
            inter_dir += 1 << lst;
            if (ri >= 0 && rj >= 0) {
                int32_t ax = c0[1 + 2 * lst] + c1[1 + 2 * lst];
                int32_t ay = c0[2 + 2 * lst] + c1[2 + 2 * lst];
                ax = (ax + 1 - (ax >= 0)) >> 1;
                ay = (ay + 1 - (ay >= 0)) >> 1;
                mv_out[lst][0] = ax;
                mv_out[lst][1] = ay;
                ref_out[lst] = ri;
            } else if (ri >= 0) {
                mv_out[lst][0] = c0[1 + 2 * lst];
                mv_out[lst][1] = c0[2 + 2 * lst];
                ref_out[lst] = ri;
            } else {
                mv_out[lst][0] = c1[1 + 2 * lst];
                mv_out[lst][1] = c1[2 + 2 * lst];
                ref_out[lst] = rj;
            }
        }
        if (inter_dir > 0) {
            int32_t alt = (c0[8] == c1[8]) ? c0[8] : 0;
            int32_t c[MC_ENT] = {inter_dir, mv_out[0][0], mv_out[0][1],
                                 mv_out[1][0], mv_out[1][1], ref_out[0],
                                 ref_out[1], 0, alt};
            ADD(c);
        }
    }

    /* zero candidates */
    {
        int n0 = slt[SLT_N_ACT0], n1 = slt[SLT_N_ACT1];
        int n_ref = is_b ? (n0 < n1 ? n0 : n1) : n0;
        int r = 0, refcnt = 0;
        while (n < max_cand) {
            int32_t c[MC_ENT] = {is_b ? 3 : 1, 0, 0, 0, 0, r,
                                 is_b ? r : -1, 0, 0};
            ADD(c);
            if (refcnt == n_ref - 1)
                r = 0;
            else {
                r += 1;
                refcnt += 1;
            }
        }
    }
    DONE();
#undef MI_OF
#undef ADD
#undef DONE
}

static PyObject *MotionCtx_merge_list(MotionCtx *self, PyObject *args)
{
    int idx;
    Py_buffer out_buf;
    if (!PyArg_ParseTuple(args, "iw*", &idx, &out_buf))
        return NULL;
    int n = mc_merge_core(self, idx, (int32_t *)out_buf.buf);
    PyBuffer_Release(&out_buf);
    return PyLong_FromLong(n);
}

/* ---- AMVP pair (inter_np.fill_mvp) ---- */

static void mc_round_amvr(int32_t mv[2], int shift)
{
    if (shift == 0)
        return;
    int32_t off = 1 << (shift - 1);
    for (int i = 0; i < 2; i++) {
        int32_t v = mv[i];
        int32_t r = v >= 0 ? ((v + off - 1) >> shift) : ((v + off) >> shift);
        mv[i] = r << shift;
    }
}

static const int MC_AMVR_SHIFT[4] = {2, 4, 6, 3};

/* one spatial AMVP probe (fill_mvp.try_add); returns 1 when appended */
static int mc_amvp_try(const MotionCtx *mc, int idx, int lst,
                       int cur_ref_poc, int px, int py,
                       int32_t cands[2][2], int *n)
{
    int nb = mc_nb(mc, idx, px, py);
    if (nb < 0)
        return 0;
    int32_t e[MC_ENT];
    mc_mi_at(mc, nb, px, py, e);
    for (int src = 0; src < 2; src++) {
        int li = src == 0 ? lst : 1 - lst;
        int nri = e[5 + li];
        if (nri >= 0
            && cur_ref_poc
                == mc->ref_pocs[(size_t)li * MC_MAX_REF + nri]) {
            cands[*n][0] = e[1 + 2 * li];
            cands[*n][1] = e[2 + 2 * li];
            (*n)++;
            return 1;
        }
    }
    return 0;
}

/* core: AMVP candidate pair into out[4] = (mv0x, mv0y, mv1x, mv1y) */
static void mc_amvp_core(MotionCtx *self, int idx, int lst, int ref_idx,
                         int32_t *out)
{
    const int32_t *cu = MC_CU(self, idx);
    const int32_t *slt = self->slice_tab
        + (size_t)cu[CU_SLICE_IDX] * SLT_NF;
    int shift = MC_AMVR_SHIFT[cu[CU_IMV] & 3];
    int x = cu[CU_X], y = cu[CU_Y], w = cu[CU_W], h = cu[CU_H];
    int cur_ref_poc = self->ref_pocs[(size_t)lst * MC_MAX_REF + ref_idx];
    int32_t cands[2][2];
    int n = 0;

    /* left: A0 then A1 */
    if (!mc_amvp_try(self, idx, lst, cur_ref_poc, x - 1, y + h, cands, &n))
        mc_amvp_try(self, idx, lst, cur_ref_poc, x - 1, y + h - 1, cands,
                    &n);
    /* above: B0, B1, B2 */
    if (!mc_amvp_try(self, idx, lst, cur_ref_poc, x + w, y - 1, cands,
                     &n)) {
        if (!mc_amvp_try(self, idx, lst, cur_ref_poc, x + w - 1, y - 1,
                         cands, &n))
            mc_amvp_try(self, idx, lst, cur_ref_poc, x - 1, y - 1, cands,
                        &n);
    }

    for (int i = 0; i < n; i++)
        mc_round_amvr(cands[i], shift);
    if (n == 2 && cands[0][0] == cands[1][0] && cands[0][1] == cands[1][1])
        n = 1;
    if (self->tmvp_en && n < 2 && (w + h > 12)) {
        int c0_avail, p0[2], p1[2];
        mc_tmvp_pos(self, cu, &c0_avail, p0, p1);
        int32_t mv[2];
        if ((c0_avail
             && mc_col_mvp(self, slt, lst, p0[0], p0[1], ref_idx, mv))
            || mc_col_mvp(self, slt, lst, p1[0], p1[1], ref_idx, mv)) {
            mc_round_amvr(mv, shift);
            cands[n][0] = mv[0];
            cands[n][1] = mv[1];
            n++;
        }
    }
    if (n < 2) {
        int hn = self->hist_n[0];
        int lim = hn < MC_HMVP_AMVP ? hn : MC_HMVP_AMVP;
        for (int k = 0; k < lim && n < 2; k++) {
            const int32_t *e = self->hist + (size_t)k * MC_ENT;
            for (int src = 0; src < 2 && n < 2; src++) {
                int li = src == 0 ? lst : 1 - lst;
                int nri = e[5 + li];
                if (nri >= 0
                    && cur_ref_poc
                        == self->ref_pocs[(size_t)li * MC_MAX_REF + nri]) {
                    int32_t mv[2] = {e[1 + 2 * li], e[2 + 2 * li]};
                    mc_round_amvr(mv, shift);
                    cands[n][0] = mv[0];
                    cands[n][1] = mv[1];
                    n++;
                }
            }
        }
    }
    while (n < 2) {
        cands[n][0] = 0;
        cands[n][1] = 0;
        n++;
    }
    out[0] = cands[0][0];
    out[1] = cands[0][1];
    out[2] = cands[1][0];
    out[3] = cands[1][1];
}

static PyObject *MotionCtx_amvp_list(MotionCtx *self, PyObject *args)
{
    int idx, lst, ref_idx;
    Py_buffer out_buf;
    if (!PyArg_ParseTuple(args, "iiiw*", &idx, &lst, &ref_idx, &out_buf))
        return NULL;
    mc_amvp_core(self, idx, lst, ref_idx, (int32_t *)out_buf.buf);
    PyBuffer_Release(&out_buf);
    Py_RETURN_NONE;
}

/* ---- lifecycle ---- */

static void MotionCtx_dealloc(MotionCtx *self)
{
    PyBuffer_Release(&self->b_cu_rec);
    PyBuffer_Release(&self->b_cu_map);
    PyBuffer_Release(&self->b_mi_ref);
    PyBuffer_Release(&self->b_mi_mv);
    PyBuffer_Release(&self->b_side);
    PyBuffer_Release(&self->b_hist);
    PyBuffer_Release(&self->b_hist_n);
    PyBuffer_Release(&self->b_slice_tab);
    PyBuffer_Release(&self->b_ref_pocs);
    for (int i = 0; i < self->n_cols; i++) {
        PyBuffer_Release(&self->cols[i].b_ref);
        PyBuffer_Release(&self->cols[i].b_mv);
    }
    free(self->cols);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static int MotionCtx_init(MotionCtx *self, PyObject *args, PyObject *kw)
{
    PyObject *cols_list;
    (void)kw;
    memset(&self->b_cu_rec, 0, sizeof(Py_buffer) * 9);
    self->cols = NULL;
    self->n_cols = 0;
    if (!PyArg_ParseTuple(
            args, "y*y*y*y*y*y*y*y*y*O(iiiiiii)(iiii)", &self->b_cu_rec,
            &self->b_cu_map, &self->b_mi_ref, &self->b_mi_mv,
            &self->b_side, &self->b_hist, &self->b_hist_n,
            &self->b_slice_tab, &self->b_ref_pocs, &cols_list,
            &self->n_cu, &self->w, &self->h, &self->w4, &self->h4,
            &self->ctu_log2, &self->wpp, &self->max_merge,
            &self->tmvp_en, &self->check_ldc, &self->poc))
        return -1;
    self->cu_rec = (const int32_t *)self->b_cu_rec.buf;
    self->cu_map = (const int32_t *)self->b_cu_map.buf;
    self->mi_ref = (const int8_t *)self->b_mi_ref.buf;
    self->mi_mv = (const int32_t *)self->b_mi_mv.buf;
    self->side = (const int32_t *)self->b_side.buf;
    self->hist = (const int32_t *)self->b_hist.buf;
    self->hist_n = (const int32_t *)self->b_hist_n.buf;
    self->slice_tab = (const int32_t *)self->b_slice_tab.buf;
    self->ref_pocs = (const int32_t *)self->b_ref_pocs.buf;
    if (!PyList_Check(cols_list)) {
        PyErr_SetString(PyExc_TypeError, "cols must be a list");
        return -1;
    }
    int nc = (int)PyList_GET_SIZE(cols_list);
    self->cols = calloc(nc ? nc : 1, sizeof(MCol));
    for (int i = 0; i < nc; i++) {
        /* each: (ref_idx int8 buf, mv int32 buf, poc, pocs int32[2*17],
         *        w8, h8) */
        PyObject *t = PyList_GET_ITEM(cols_list, i);
        PyObject *pocs_obj;
        MCol *c = &self->cols[i];
        if (!PyArg_ParseTuple(t, "y*y*iOii", &c->b_ref, &c->b_mv, &c->poc,
                              &pocs_obj, &c->w8, &c->h8))
            return -1;
        Py_buffer pb;
        if (PyObject_GetBuffer(pocs_obj, &pb, PyBUF_SIMPLE) < 0)
            return -1;
        memcpy(c->ref_pocs, pb.buf,
               sizeof(int32_t) * 2 * MC_MAX_REF < (size_t)pb.len
                   ? sizeof(int32_t) * 2 * MC_MAX_REF
                   : (size_t)pb.len);
        PyBuffer_Release(&pb);
        c->ref_idx = (const int8_t *)c->b_ref.buf;
        c->mv = (const int32_t *)c->b_mv.buf;
        self->n_cols++;
    }
    return 0;
}

static PyMethodDef MotionCtx_methods[] = {
    {"merge_list", (PyCFunction)MotionCtx_merge_list, METH_VARARGS,
     "regular merge candidate list into out [max_merge, 9]"},
    {"amvp_list", (PyCFunction)MotionCtx_amvp_list, METH_VARARGS,
     "AMVP candidate pair into out [2, 2]"},
    {NULL},
};

static PyTypeObject MotionCtxType = {
    PyVarObject_HEAD_INIT(NULL, 0).tp_name = "_cabac.MotionCtx",
    .tp_basicsize = sizeof(MotionCtx),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)MotionCtx_init,
    .tp_dealloc = (destructor)MotionCtx_dealloc,
    .tp_methods = MotionCtx_methods,
};
