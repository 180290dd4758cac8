/* Native deblocking boundary-strength derivation.
 *
 * C port of Deblocker.derive_strengths / _tu_edges / _subblock_edges /
 * _mv_bs (vvdec_tpu/frame/deblock_np.py), itself parity with vvdec
 * LoopFilter.cpp (xSetMaxFilterLengthPQFromTransformSizes :780,
 * xGetBoundaryStrengthSingle :1094, xSetEdgeFilterInsidePu :1032,
 * xSetMaxFilterLengthPQForCodingSubBlocks :707).
 *
 * Operates directly on the syntax walk's flat CU/TU records (walk.c
 * layout), the cu maps, and the 4x4 motion field — no Python objects.
 * Fills the packed per-direction edge-parameter tensor
 * int16 [2 dirs][10 planes][h4][w4] with plane order:
 *   bs_y, bs_cb, bs_cr, qp_y, qp_cb, qp_cr, max_fl_p, max_fl_q, cmfl, te
 *
 * #included by cabac.c after walk3.c.
 */

enum {
    EP_BS_Y, EP_BS_CB, EP_BS_CR, EP_QP_Y, EP_QP_CB, EP_QP_CR,
    EP_MAX_FL_P, EP_MAX_FL_Q, EP_CMFL, EP_TE, EP_NPLANES
};

#define POC_NONE INT32_MIN
#define POC_SELF INT32_MAX

typedef struct {
    const int32_t *cu_rec, *tu_rec;
    int n_cus, n_tus;
    const uint8_t *cu_extra; /* bit0: subblock motion (affine / SbTMVP) */
    const uint8_t *sl_flags; /* bit0: deblocking disabled, bit1: is_b */
    int n_slices;
    const int32_t *cu_map, *cu_map_c;
    const int32_t *mi_mv;   /* [h4][w4][2][2] */
    const int8_t *mi_ref;   /* [h4][w4][2] */
    const int32_t *ref_pocs; /* [2][16], POC_NONE when absent */
    const int32_t *subpics;  /* [n_sp][6] */
    int n_sp;
    int pic_w, pic_h, sub_w, sub_h, num_comp, qp_bd_offset;
    int lf_across_slices, lf_across_tiles;
    int w4, h4, cw2, ch2, cpw, cph;
    int32_t *tu_map, *tu_map_c; /* scratch, per-4x4 luma units */
    int16_t *ep; /* [2][EP_NPLANES][h4][w4] */
} DbCtx;

#define DB_CU(c, i) ((c)->cu_rec + (size_t)(i) * CU_NF)
#define DB_TU(c, i) ((c)->tu_rec + (size_t)(i) * TUF_NF)
#define DB_EP(c, dir, plane) \
    ((c)->ep + (((size_t)(dir) * EP_NPLANES + (plane)) * (c)->h4 * (c)->w4))

static inline int db_cu_at(DbCtx *c, int x, int y, int ch)
{
    if (x < 0 || y < 0) return -1;
    if (ch == 0) {
        if (x >= c->pic_w || y >= c->pic_h) return -1;
        return c->cu_map[(size_t)(y >> 2) * c->w4 + (x >> 2)];
    }
    if (!c->cu_map_c) return -1;
    if (x >= c->cpw || y >= c->cph) return -1;
    return c->cu_map_c[(size_t)(y >> 1) * c->cw2 + (x >> 1)];
}

static const int32_t *db_subpic_at(DbCtx *c, int x, int y)
{
    for (int i = 0; i < c->n_sp; i++) {
        const int32_t *sp = c->subpics + (size_t)i * 6;
        if (sp[0] <= x && x < sp[2] && sp[1] <= y && y < sp[3])
            return sp;
    }
    return NULL;
}

static int db_cu_edge_allowed(DbCtx *c, const int32_t *cu, int dir)
{
    int x = cu[CU_X], y = cu[CU_Y];
    int nb;
    if (dir == 0) {
        if (x == 0) return 0;
        nb = db_cu_at(c, x - 1, y, 0);
    } else {
        if (y == 0) return 0;
        nb = db_cu_at(c, x, y - 1, 0);
    }
    if (nb < 0) return 0;
    const int32_t *cn = DB_CU(c, nb);
    if (cn[CU_SLICE_IDX] != cu[CU_SLICE_IDX] && !c->lf_across_slices)
        return 0;
    if (cn[CU_TILE_IDX] != cu[CU_TILE_IDX] && !c->lf_across_tiles)
        return 0;
    if (c->n_sp) {
        int nx = dir == 0 ? x - 1 : x;
        int ny = dir == 0 ? y : y - 1;
        const int32_t *sp_q = db_subpic_at(c, x, y);
        const int32_t *sp_p = db_subpic_at(c, nx, ny);
        if (sp_q != sp_p
            && !((sp_q == NULL || sp_q[5]) && (sp_p == NULL || sp_p[5])))
            return 0;
    }
    return 1;
}

static inline int db_poc(DbCtx *c, int lst, int ri, int is_ibc)
{
    if (lst == 0 && is_ibc) return POC_SELF;
    if (ri < 0 || ri >= 16) return POC_NONE;
    return c->ref_pocs[lst * 16 + ri];
}

static inline int db_mv_diff(const int32_t *a, const int32_t *b)
{
    int dx = a[0] - b[0], dy = a[1] - b[1];
    if (dx < 0) dx = -dx;
    if (dy < 0) dy = -dy;
    return dx >= 8 || dy >= 8; /* half-pel in 1/16 units */
}

static int db_mv_bs(DbCtx *c, const int32_t *cu_q, const int32_t *cu_p,
                    int qx, int qy, int px, int py)
{
    /* xGetBoundaryStrengthSingle tail (LoopFilter.cpp:1215) */
    if (cu_q[CU_PRED_MODE] != cu_p[CU_PRED_MODE])
        return 1;
    size_t qo = ((size_t)(qy >> 2) * c->w4 + (qx >> 2));
    size_t po = ((size_t)(py >> 2) * c->w4 + (px >> 2));
    const int32_t *mvq = c->mi_mv + qo * 4;
    const int32_t *mvp = c->mi_mv + po * 4;
    int rq0 = c->mi_ref[qo * 2], rq1 = c->mi_ref[qo * 2 + 1];
    int rp0 = c->mi_ref[po * 2], rp1 = c->mi_ref[po * 2 + 1];
    int is_ibc = cu_q[CU_PRED_MODE] == W_MODE_IBC;
    int sl = cu_q[CU_SLICE_IDX];
    int is_b = sl >= 0 && sl < c->n_slices && (c->sl_flags[sl] & 2);

    if (is_b) {
        int p0 = db_poc(c, 0, rp0, is_ibc), p1 = db_poc(c, 1, rp1, is_ibc);
        int q0 = db_poc(c, 0, rq0, is_ibc), q1 = db_poc(c, 1, rq1, is_ibc);
        if (!((p0 == q0 && p1 == q1) || (p0 == q1 && p1 == q0)))
            return 1;
        static const int32_t zero[2] = {0, 0};
        const int32_t *mv_p0 = p0 != POC_NONE ? mvp : zero;
        const int32_t *mv_p1 = p1 != POC_NONE ? mvp + 2 : zero;
        const int32_t *mv_q0 = q0 != POC_NONE ? mvq : zero;
        const int32_t *mv_q1 = q1 != POC_NONE ? mvq + 2 : zero;
        if (p0 != p1) {
            if (p0 == q0)
                return db_mv_diff(mv_q0, mv_p0) || db_mv_diff(mv_q1, mv_p1);
            return db_mv_diff(mv_q1, mv_p0) || db_mv_diff(mv_q0, mv_p1);
        }
        return (db_mv_diff(mv_q0, mv_p0) || db_mv_diff(mv_q1, mv_p1))
               && (db_mv_diff(mv_q1, mv_p0) || db_mv_diff(mv_q0, mv_p1));
    }
    if (db_poc(c, 0, rp0, is_ibc) != db_poc(c, 0, rq0, is_ibc))
        return 1;
    return db_mv_diff(mvq, mvp);
}

static void db_tu_edges(DbCtx *c, int ti, int dir)
{
    const int32_t *tu = DB_TU(c, ti);
    const int32_t *cu = DB_CU(c, tu[TUF_CU_IDX]);
    int16_t *bs_y = DB_EP(c, dir, EP_BS_Y);
    int16_t *bs_cb = DB_EP(c, dir, EP_BS_CB);
    int16_t *bs_cr = DB_EP(c, dir, EP_BS_CR);
    int16_t *qp_y = DB_EP(c, dir, EP_QP_Y);
    int16_t *qp_cb = DB_EP(c, dir, EP_QP_CB);
    int16_t *qp_cr = DB_EP(c, dir, EP_QP_CR);
    int16_t *fl_p = DB_EP(c, dir, EP_MAX_FL_P);
    int16_t *fl_q = DB_EP(c, dir, EP_MAX_FL_Q);
    int16_t *cmfl = DB_EP(c, dir, EP_CMFL);
    int16_t *te = DB_EP(c, dir, EP_TE);

    int x, y, w, h;
    if (tu[TUF_BW0] != 0) {
        x = tu[TUF_BX0]; y = tu[TUF_BY0];
        w = tu[TUF_BW0]; h = tu[TUF_BH0];
    } else {
        x = tu[TUF_BX1] * c->sub_w; y = tu[TUF_BY1] * c->sub_h;
        w = tu[TUF_BW1] * c->sub_w; h = tu[TUF_BH1] * c->sub_h;
    }
    int at_cu_edge = dir == 0 ? ((x & ~3) == cu[CU_X])
                              : ((y & ~3) == cu[CU_Y]);
    int filter_edge = at_cu_edge ? db_cu_edge_allowed(c, cu, dir) : 1;
    int edge_pos = dir == 0 ? x : y;
    int luma_edge = edge_pos != 0 && filter_edge && tu[TUF_BW0] != 0;

    if (luma_edge) {
        int n_cells = (dir == 0 ? h : w) >> 2;
        if (n_cells < 1) n_cells = 1;
        for (int d = 0; d < n_cells; d++) {
            int cx4, cy4, px, py, bx, by;
            if (dir == 0) {
                cx4 = x >> 2; cy4 = (y >> 2) + d;
                px = x - 1; py = y + 4 * d;
                bx = (cx4 << 2) - 1; by = cy4 << 2;
            } else {
                cx4 = (x >> 2) + d; cy4 = y >> 2;
                px = x + 4 * d; py = y - 1;
                bx = cx4 << 2; by = (cy4 << 2) - 1;
            }
            int cp = db_cu_at(c, bx, by, 0);
            if (cp < 0) continue; /* defensive; mirrors cu_at None */
            const int32_t *cu_p = DB_CU(c, cp);
            int tp = c->tu_map[(size_t)(py >> 2) * c->w4 + (px >> 2)];
            if (tp < 0) continue;
            const int32_t *tu_p = DB_TU(c, tp);
            int size_q = dir == 0 ? w : h;
            int size_p = dir == 0 ? tu_p[TUF_BW0] : tu_p[TUF_BH0];
            int same_cu_tu = dir == 0 ? (x == cu[CU_X]) : (y == cu[CU_Y]);
            int bs;
            if (cu[CU_PRED_MODE] == W_MODE_INTRA
                || cu_p[CU_PRED_MODE] == W_MODE_INTRA) {
                bs = (cu[CU_BDPCM] && cu_p[CU_BDPCM]) ? 0 : 2;
            } else if (cu[CU_CIIP] || cu_p[CU_CIIP]) {
                bs = 2;
            } else if (tu[TUF_CBF0] || tu_p[TUF_CBF0]) {
                bs = 1;
            } else if (same_cu_tu) {
                int qx = cx4 << 2, qy = cy4 << 2;
                int pxm = dir == 0 ? qx - 1 : qx;
                int pym = dir == 0 ? qy : qy - 1;
                bs = db_mv_bs(c, cu, cu_p, qx, qy, pxm, pym);
            } else {
                bs = 0;
            }
            size_t o = (size_t)cy4 * c->w4 + cx4;
            bs_y[o] = (int16_t)bs;
            qp_y[o] = (int16_t)((cu[CU_QP] + cu_p[CU_QP] + 1) >> 1);
            te[o] = 1;
            int flp, flq;
            if (size_p <= 4 || size_q <= 4) {
                flp = flq = 1;
            } else {
                flp = size_p >= 32 ? (cu_p[CU_AFFINE] ? 5 : 7) : 3;
                flq = size_q >= 32 ? 7 : 3;
            }
            fl_p[o] = (int16_t)flp;
            fl_q[o] = (int16_t)flq;
        }
    }

    /* chroma edges */
    if (tu[TUF_BW1] == 0 || c->num_comp == 1) return;
    int cx0 = tu[TUF_BX1], cy0 = tu[TUF_BY1];
    int cw = tu[TUF_BW1], chh = tu[TUF_BH1];
    int edge_pos_c = dir == 0 ? cx0 : cy0;
    if (edge_pos_c == 0 || !filter_edge) return;
    int qp_bd2 = c->qp_bd_offset * 2;
    int inc_c = 4 / (dir == 0 ? c->sub_h : c->sub_w);
    int n_cells_c = (dir == 0 ? chh : cw) / inc_c;
    for (int d = 0; d < n_cells_c; d++) {
        int pcx, pcy, cx4, cy4;
        if (dir == 0) {
            pcx = cx0 - 1; pcy = cy0 + inc_c * d;
            cx4 = (cx0 * c->sub_w) >> 2;
            cy4 = ((cy0 + inc_c * d) * c->sub_h) >> 2;
        } else {
            pcx = cx0 + inc_c * d; pcy = cy0 - 1;
            cy4 = (cy0 * c->sub_h) >> 2;
            cx4 = ((cx0 + inc_c * d) * c->sub_w) >> 2;
        }
        int plx = pcx * c->sub_w, ply = pcy * c->sub_h;
        int cp = db_cu_at(c, pcx, pcy, 1);
        if (cp < 0) cp = db_cu_at(c, plx, ply, 0);
        if (cp < 0) continue;
        const int32_t *cu_p = DB_CU(c, cp);
        int tp = c->tu_map_c[(size_t)(ply >> 2) * c->w4 + (plx >> 2)];
        if (tp < 0) continue;
        const int32_t *tu_p = DB_TU(c, tp);
        int bs_b, bs_r;
        if (cu[CU_PRED_MODE] == W_MODE_INTRA
            || cu_p[CU_PRED_MODE] == W_MODE_INTRA) {
            int z = (cu[CU_BDPCM_C] && cu_p[CU_BDPCM_C]) ? 0 : 2;
            bs_b = bs_r = z;
        } else if (cu[CU_CIIP] || cu_p[CU_CIIP]) {
            bs_b = bs_r = 2;
        } else {
            int jc = tu[TUF_JOINT_CBCR] || tu_p[TUF_JOINT_CBCR];
            bs_b = (tu[TUF_CBF1] || tu_p[TUF_CBF1] || jc) ? 1 : 0;
            bs_r = (tu[TUF_CBF2] || tu_p[TUF_CBF2] || jc) ? 1 : 0;
        }
        size_t o = (size_t)cy4 * c->w4 + cx4;
        bs_cb[o] = (int16_t)bs_b;
        bs_cr[o] = (int16_t)bs_r;
        qp_cb[o] = (int16_t)((tu_p[TUF_CQP0] + tu[TUF_CQP0] - qp_bd2 + 1)
                             >> 1);
        qp_cr[o] = (int16_t)((tu_p[TUF_CQP1] + tu[TUF_CQP1] - qp_bd2 + 1)
                             >> 1);
        int size_q = dir == 0 ? cw : chh;
        int size_p = dir == 0 ? tu_p[TUF_BW1] : tu_p[TUF_BH1];
        cmfl[o] = (size_p >= 8 && size_q >= 8) ? 1 : 0;
    }
}

static void db_subblock_edges(DbCtx *c, const int32_t *cu, int dir)
{
    int16_t *bs_y = DB_EP(c, dir, EP_BS_Y);
    int16_t *qp_y = DB_EP(c, dir, EP_QP_Y);
    int16_t *fl_p = DB_EP(c, dir, EP_MAX_FL_P);
    int16_t *fl_q = DB_EP(c, dir, EP_MAX_FL_Q);
    int16_t *te = DB_EP(c, dir, EP_TE);
    int perp_size = dir == 0 ? cu[CU_W] : cu[CU_H];
    int parl_size = dir == 0 ? cu[CU_H] : cu[CU_W];

    for (int off = 8; off < perp_size; off += 8) {
        for (int par = 0; par < parl_size; par += 4) {
            int x = cu[CU_X] + (dir == 0 ? off : par);
            int y = cu[CU_Y] + (dir == 0 ? par : off);
            int cx4 = x >> 2, cy4 = y >> 2;
            size_t o = (size_t)cy4 * c->w4 + cx4;
            if (te[o]) {
                if (bs_y[o] != 0) continue;
            } else {
                qp_y[o] = (int16_t)cu[CU_QP];
            }
            int px = dir == 0 ? x - 1 : x;
            int py = dir == 0 ? y : y - 1;
            bs_y[o] = (int16_t)db_mv_bs(c, cu, cu, x, y, px, py);
        }
    }

    for (int off = 0; off < perp_size; off += 8) {
        for (int par = 0; par < parl_size; par += 4) {
            int x = cu[CU_X] + (dir == 0 ? off : par);
            int y = cu[CU_Y] + (dir == 0 ? par : off);
            int cx4 = x >> 2, cy4 = y >> 2;
            size_t o = (size_t)cy4 * c->w4 + cx4;
            int p, q;
#define DB_TE_AT(k) (dir == 0 ? te[o + (k)] : te[o + (ptrdiff_t)(k) * c->w4])
            if (te[o]) {
                q = fl_q[o] < 5 ? fl_q[o] : 5;
                p = fl_p[o];
                if (off > 0 && p > 5) p = 5;
            } else if (off > 0
                       && (DB_TE_AT(-1) || off + 4 >= perp_size
                           || DB_TE_AT(1))) {
                p = q = 1;
            } else if (off > 0
                       && (off == 8 || DB_TE_AT(-2) || off + 8 >= perp_size
                           || DB_TE_AT(2))) {
                p = q = 2;
            } else {
                p = q = 3;
            }
#undef DB_TE_AT
            fl_p[o] = (int16_t)p;
            fl_q[o] = (int16_t)q;
        }
    }
}

/* deblock_strengths(ep w* int16[2*10*h4*w4], cu_rec y*, tu_rec y*,
 *   n_cus, n_tus, cu_extra y* u8, sl_flags y* u8, n_slices,
 *   cu_map y*, cu_map_c y*, mi_mv y*, mi_ref y*, ref_pocs y* i32[32],
 *   subpics y* i32[n*6], n_sp, pic_w, pic_h, sub_w, sub_h, num_comp,
 *   qp_bd_offset, lf_across_slices, lf_across_tiles) */
static PyObject *mod_deblock_strengths(PyObject *self, PyObject *args)
{
    DbCtx c;
    memset(&c, 0, sizeof(c));
    Py_buffer b_ep, b_cu, b_tu, b_extra, b_sl, b_cum, b_cumc, b_mv, b_ref,
        b_pocs, b_sp;
    if (!PyArg_ParseTuple(
            args, "w*y*y*iiy*y*iy*y*y*y*y*y*iiiiiiiii",
            &b_ep, &b_cu, &b_tu, &c.n_cus, &c.n_tus, &b_extra, &b_sl,
            &c.n_slices, &b_cum, &b_cumc, &b_mv, &b_ref, &b_pocs, &b_sp,
            &c.n_sp, &c.pic_w, &c.pic_h, &c.sub_w, &c.sub_h, &c.num_comp,
            &c.qp_bd_offset, &c.lf_across_slices, &c.lf_across_tiles))
        return NULL;
    c.ep = (int16_t *)b_ep.buf;
    c.cu_rec = (const int32_t *)b_cu.buf;
    c.tu_rec = (const int32_t *)b_tu.buf;
    c.cu_extra = (const uint8_t *)b_extra.buf;
    c.sl_flags = (const uint8_t *)b_sl.buf;
    c.cu_map = (const int32_t *)b_cum.buf;
    c.cu_map_c = c.num_comp > 1 ? (const int32_t *)b_cumc.buf : NULL;
    c.mi_mv = (const int32_t *)b_mv.buf;
    c.mi_ref = (const int8_t *)b_ref.buf;
    c.ref_pocs = (const int32_t *)b_pocs.buf;
    c.subpics = (const int32_t *)b_sp.buf;
    c.w4 = c.pic_w >> 2;
    c.h4 = c.pic_h >> 2;
    c.cpw = c.pic_w / c.sub_w;
    c.cph = c.pic_h / c.sub_h;
    c.cw2 = c.cpw >> 1;
    c.ch2 = c.cph >> 1;

    /* per-4x4 TU index maps (Deblocker.__init__ parity) */
    size_t map_n = (size_t)c.w4 * c.h4;
    c.tu_map = (int32_t *)malloc(map_n * 2 * sizeof(int32_t));
    if (!c.tu_map) {
        PyErr_NoMemory();
        goto fail;
    }
    c.tu_map_c = c.tu_map + map_n;
    Py_BEGIN_ALLOW_THREADS
    for (size_t i = 0; i < map_n * 2; i++)
        c.tu_map[i] = -1;
    for (int i = 0; i < c.n_tus; i++) {
        const int32_t *tu = DB_TU(&c, i);
        if (tu[TUF_BW0] != 0) {
            int x = tu[TUF_BX0], y = tu[TUF_BY0];
            int w = tu[TUF_BW0], h = tu[TUF_BH0];
            for (int y4 = y >> 2; y4 < (y + h) >> 2; y4++)
                for (int x4 = x >> 2; x4 < (x + w) >> 2; x4++)
                    c.tu_map[(size_t)y4 * c.w4 + x4] = i;
        }
        if (tu[TUF_BW1] != 0) {
            int x = tu[TUF_BX1] * c.sub_w, y = tu[TUF_BY1] * c.sub_h;
            int w = tu[TUF_BW1] * c.sub_w, h = tu[TUF_BH1] * c.sub_h;
            for (int y4 = y >> 2; y4 < (y + h) >> 2; y4++)
                for (int x4 = x >> 2; x4 < (x + w) >> 2; x4++)
                    c.tu_map_c[(size_t)y4 * c.w4 + x4] = i;
        }
    }

    for (int i = 0; i < c.n_tus; i++) {
        const int32_t *tu = DB_TU(&c, i);
        const int32_t *cu = DB_CU(&c, tu[TUF_CU_IDX]);
        int sl = cu[CU_SLICE_IDX];
        if (sl >= 0 && sl < c.n_slices && (c.sl_flags[sl] & 1))
            continue;
        db_tu_edges(&c, i, 0);
        db_tu_edges(&c, i, 1);
    }
    for (int i = 0; i < c.n_cus; i++) {
        const int32_t *cu = DB_CU(&c, i);
        int sl = cu[CU_SLICE_IDX];
        if (sl >= 0 && sl < c.n_slices && (c.sl_flags[sl] & 1))
            continue;
        if (c.cu_extra[i] & 1) {
            db_subblock_edges(&c, cu, 0);
            db_subblock_edges(&c, cu, 1);
        }
    }
    Py_END_ALLOW_THREADS

    free(c.tu_map);
    PyBuffer_Release(&b_ep);
    PyBuffer_Release(&b_cu);
    PyBuffer_Release(&b_tu);
    PyBuffer_Release(&b_extra);
    PyBuffer_Release(&b_sl);
    PyBuffer_Release(&b_cum);
    PyBuffer_Release(&b_cumc);
    PyBuffer_Release(&b_mv);
    PyBuffer_Release(&b_ref);
    PyBuffer_Release(&b_pocs);
    PyBuffer_Release(&b_sp);
    Py_RETURN_NONE;
fail:
    PyBuffer_Release(&b_ep);
    PyBuffer_Release(&b_cu);
    PyBuffer_Release(&b_tu);
    PyBuffer_Release(&b_extra);
    PyBuffer_Release(&b_sl);
    PyBuffer_Release(&b_cum);
    PyBuffer_Release(&b_cumc);
    PyBuffer_Release(&b_mv);
    PyBuffer_Release(&b_ref);
    PyBuffer_Release(&b_pocs);
    PyBuffer_Release(&b_sp);
    return NULL;
}

/* deblock_filter_frame(y w*, cb w*, cr w*, pic_w, pic_h, sub_w, sub_h,
 *   ep y* int16[2][EP_NPLANES][h4][w4] (from deblock_strengths),
 *   slice_map y* int32[h4][w4],
 *   sl_prm y* int32[n_slices][6] (tc,beta,cb_tc,cr_tc,cb_beta,cr_beta),
 *   n_slices, bd, ctu_size, num_comp)
 *
 * Whole-frame directional filtering in one call: scans the packed edge
 * tensor and filters every active luma/chroma cell, both directions
 * (LoopFilter::loopFilterCTU EDGE_VER then EDGE_HOR, whole frame).
 * Replaces the per-direction Python cell scans. */
static PyObject *mod_deblock_filter_frame(PyObject *self, PyObject *args)
{
    Py_buffer b_y, b_cb, b_cr, b_ep, b_sm, b_sp;
    int pic_w, pic_h, sub_w, sub_h, n_slices, bd, ctu_size, num_comp;
    if (!PyArg_ParseTuple(args, "w*w*w*iiiiy*y*y*iiii",
                          &b_y, &b_cb, &b_cr, &pic_w, &pic_h, &sub_w, &sub_h,
                          &b_ep, &b_sm, &b_sp, &n_slices, &bd, &ctu_size,
                          &num_comp))
        return NULL;
    int w4 = pic_w >> 2, h4 = pic_h >> 2;
    const int16_t *ep = (const int16_t *)b_ep.buf;
    const int32_t *smap = (const int32_t *)b_sm.buf;
    const int32_t *sprm = (const int32_t *)b_sp.buf;
    int pel_max = (1 << bd) - 1;
    int cw = pic_w / sub_w, ch = pic_h / sub_h;

    Py_BEGIN_ALLOW_THREADS
    for (int dir = 0; dir < 2; dir++) {
        const int16_t *P = ep + (size_t)dir * EP_NPLANES * h4 * w4;
#define DBF_PL(pl) (P + (size_t)(pl) * h4 * w4)
        const int16_t *bs_y = DBF_PL(EP_BS_Y), *qp_y = DBF_PL(EP_QP_Y),
            *flp = DBF_PL(EP_MAX_FL_P), *flq = DBF_PL(EP_MAX_FL_Q);
        for (int y4 = 0; y4 < h4; y4++) {
            size_t row = (size_t)y4 * w4;
            for (int x4 = 0; x4 < w4; x4++) {
                size_t o = row + x4;
                if (bs_y[o] <= 0)
                    continue;
                int sl = n_slices > 1 ? smap[o] : 0;
                if (sl < 0 || sl >= n_slices) sl = 0;
                const int32_t *sp = sprm + (size_t)sl * 6;
                db_luma_cell((int32_t *)b_y.buf, pic_w, dir, x4 << 2,
                             y4 << 2, pel_max, bd, ctu_size, bs_y[o],
                             qp_y[o], flp[o], flq[o], sp[0], sp[1]);
            }
        }
        if (num_comp > 1) {
            const int16_t *bs_cb = DBF_PL(EP_BS_CB),
                *bs_cr = DBF_PL(EP_BS_CR), *qp_cb = DBF_PL(EP_QP_CB),
                *qp_cr = DBF_PL(EP_QP_CR), *cmfl = DBF_PL(EP_CMFL);
            int ctu_c_mask = ctu_size / sub_h - 1;
            int par_step = 4 / (dir == 0 ? sub_h : sub_w);
            int sub_shift = (dir == 0 ? sub_h : sub_w) - 1;
            int lim0 = dir == 0 ? cw : ch;   /* perpendicular extent */
            int lim1 = dir == 0 ? ch : cw;   /* parallel extent */
            for (int c0 = 8; c0 < lim0; c0 += 8)
                for (int c1 = 0; c1 < lim1; c1 += par_step) {
                    int ccx = dir == 0 ? c0 : c1;
                    int ccy = dir == 0 ? c1 : c0;
                    size_t o = (size_t)((ccy * sub_h) >> 2) * w4
                               + ((ccx * sub_w) >> 2);
                    int bcb = bs_cb[o], bcr = bs_cr[o];
                    if (bcb <= 0 && bcr <= 0)
                        continue;
                    int large = cmfl[o];
                    int hor_ctb = dir == 1 && (ccy & ctu_c_mask) == 0;
                    int sl = n_slices > 1 ? smap[o] : 0;
                    if (sl < 0 || sl >= n_slices) sl = 0;
                    const int32_t *sp = sprm + (size_t)sl * 6;
                    if (bcb == 2 || (large && bcb == 1))
                        db_chroma_cell((int32_t *)b_cb.buf, cw, dir, ccx,
                                       ccy, pel_max, bd, par_step,
                                       sub_shift, bcb, qp_cb[o], large,
                                       sp[2], sp[4], hor_ctb);
                    if (bcr == 2 || (large && bcr == 1))
                        db_chroma_cell((int32_t *)b_cr.buf, cw, dir, ccx,
                                       ccy, pel_max, bd, par_step,
                                       sub_shift, bcr, qp_cr[o], large,
                                       sp[3], sp[5], hor_ctb);
                }
        }
#undef DBF_PL
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_y);
    PyBuffer_Release(&b_cb);
    PyBuffer_Release(&b_cr);
    PyBuffer_Release(&b_ep);
    PyBuffer_Release(&b_sm);
    PyBuffer_Release(&b_sp);
    Py_RETURN_NONE;
}

/* ---------------- whole-frame SAO in C ----------------
 * sao_apply_frame(y w*, cb w*, cr w*, pic_w, pic_h, sub_w, sub_h,
 *   num_comp, ctu, w_ctu, h_ctu, sao_rec y* int32[n_ctu*24],
 *   flags y* int32[n_ctu], slice_map y* int32[h4*w4],
 *   tile_map y* int32[h4*w4], subpics y* int32[n_sp*6], n_sp,
 *   lf_across_slices, lf_across_tiles, vbx y* int32[nvx], nvx,
 *   vby y* int32[nvy], nvy, bd)
 *
 * One call applies SAO to the whole picture in place, reading the
 * syntax walk's flat per-CTU records (w_sao_ctu layout: 3 comps x
 * (mode, type, band, o0..o3, pad)).  Neighbor samples come from an
 * internal pre-SAO snapshot (SampleAdaptiveOffset::offsetCTU reads
 * m_tempBuf).  Parity: frame/sao_np.py sao_frame_per_ctu/_eo_mask. */
typedef struct {
    const int32_t *slice_map, *tile_map, *subpics;
    int n_sp, w4, lf_sl, lf_tl, w_ctu, h_ctu, ctu;
} SaoAvail;

static const int32_t *sao_subpic_at(const SaoAvail *a, int x, int y)
{
    for (int i = 0; i < a->n_sp; i++) {
        const int32_t *sp = a->subpics + (size_t)i * 6;
        if (sp[0] <= x && x < sp[2] && sp[1] <= y && y < sp[3])
            return sp;
    }
    return NULL;
}

static int sao_ctu_avail(const SaoAvail *a, int rx, int ry, int nx, int ny)
{
    if (nx < 0 || ny < 0 || nx >= a->w_ctu || ny >= a->h_ctu)
        return 0;
    size_t oa = (size_t)((ry * a->ctu) >> 2) * a->w4 + ((rx * a->ctu) >> 2);
    size_t ob = (size_t)((ny * a->ctu) >> 2) * a->w4 + ((nx * a->ctu) >> 2);
    if (!a->lf_sl && a->slice_map[oa] != a->slice_map[ob])
        return 0;
    if (!a->lf_tl && a->tile_map[oa] != a->tile_map[ob])
        return 0;
    if (a->n_sp) {
        const int32_t *sa = sao_subpic_at(a, rx * a->ctu, ry * a->ctu);
        const int32_t *sb = sao_subpic_at(a, nx * a->ctu, ny * a->ctu);
        if (sa != sb
            && !((sa == NULL || sa[5]) && (sb == NULL || sb[5])))
            return 0;
    }
    return 1;
}

static PyObject *mod_sao_apply_frame(PyObject *self, PyObject *args)
{
    Py_buffer b_y, b_cb, b_cr, b_rec, b_fl, b_sm, b_tm, b_sp, b_vbx, b_vby;
    int pic_w, pic_h, sub_w, sub_h, num_comp, ctu, w_ctu, h_ctu, n_sp,
        lf_sl, lf_tl, nvx, nvy, bd;
    if (!PyArg_ParseTuple(args, "w*w*w*iiiiiiiiy*y*y*y*y*iiiy*iy*ii",
                          &b_y, &b_cb, &b_cr, &pic_w, &pic_h, &sub_w,
                          &sub_h, &num_comp, &ctu, &w_ctu, &h_ctu, &b_rec,
                          &b_fl, &b_sm, &b_tm, &b_sp, &n_sp, &lf_sl,
                          &lf_tl, &b_vbx, &nvx, &b_vby, &nvy, &bd))
        return NULL;
    const int32_t *rec = (const int32_t *)b_rec.buf;
    const int32_t *flags = (const int32_t *)b_fl.buf;
    const int32_t *vbx = (const int32_t *)b_vbx.buf;
    const int32_t *vby = (const int32_t *)b_vby.buf;
    SaoAvail av = {(const int32_t *)b_sm.buf, (const int32_t *)b_tm.buf,
                   (const int32_t *)b_sp.buf, n_sp, pic_w >> 2, lf_sl,
                   lf_tl, w_ctu, h_ctu, ctu};
    int32_t *planes[3] = {(int32_t *)b_y.buf, (int32_t *)b_cb.buf,
                          (int32_t *)b_cr.buf};
    const int pel_max = (1 << bd) - 1;
    int ok = 1;

    Py_BEGIN_ALLOW_THREADS
    /* per-component pre-SAO snapshot, taken lazily */
    int32_t *snap[3] = {NULL, NULL, NULL};
    for (int comp = 0; comp < num_comp && ok; comp++) {
        const int sx = comp ? sub_w : 1, sy = comp ? sub_h : 1;
        const int cw = pic_w / sx, chh = pic_h / sy;
        int any = 0;
        for (int addr = 0; addr < w_ctu * h_ctu && !any; addr++)
            if ((flags[addr] & 1) && rec[(size_t)addr * 24 + comp * 8])
                any = 1;
        if (!any)
            continue;
        snap[comp] = (int32_t *)malloc((size_t)cw * chh * sizeof(int32_t));
        if (!snap[comp]) {
            ok = 0;
            break;
        }
        memcpy(snap[comp], planes[comp],
               (size_t)cw * chh * sizeof(int32_t));
        const int32_t *src = snap[comp];
        int32_t *dst = planes[comp];
        uint8_t colmask[1024];

        for (int ry = 0; ry < h_ctu; ry++)
            for (int rx = 0; rx < w_ctu; rx++) {
                const int addr = ry * w_ctu + rx;
                if (!(flags[addr] & 1))
                    continue;
                const int32_t *p = rec + (size_t)addr * 24 + comp * 8;
                if (p[0] == 0)
                    continue;
                const int t = p[1], band = p[2];
                const int x0 = (rx * ctu) / sx, y0 = (ry * ctu) / sy;
                const int bw = (cw - x0) < (ctu / sx) ? (cw - x0)
                                                      : (ctu / sx);
                const int bh = (chh - y0) < (ctu / sy) ? (chh - y0)
                                                       : (ctu / sy);
                /* offsets */
                int32_t table[32];
                int32_t eo_off[5];
                if (t == 4) {
                    memset(table, 0, sizeof(table));
                    for (int k = 0; k < 4; k++)
                        table[(band + k) & 31] = p[3 + k];
                } else {
                    eo_off[0] = p[3];
                    eo_off[1] = p[4];
                    eo_off[2] = 0;
                    eo_off[3] = -p[5];
                    eo_off[4] = -p[6];
                }
                /* availability */
                int L = sao_ctu_avail(&av, rx, ry, rx - 1, ry);
                int R = sao_ctu_avail(&av, rx, ry, rx + 1, ry);
                int A = sao_ctu_avail(&av, rx, ry, rx, ry - 1);
                int B = sao_ctu_avail(&av, rx, ry, rx, ry + 1);
                int in_l = rx > 0, in_r = rx + 1 < w_ctu;
                int in_a = ry > 0, in_b = ry + 1 < h_ctu;
                int AL = in_a && in_l
                         && sao_ctu_avail(&av, rx, ry, rx - 1, ry - 1);
                int AR = in_a && in_r
                         && sao_ctu_avail(&av, rx, ry, rx + 1, ry - 1);
                int BL = in_b && in_l
                         && sao_ctu_avail(&av, rx, ry, rx - 1, ry + 1);
                int BR = in_b && in_r
                         && sao_ctu_avail(&av, rx, ry, rx + 1, ry + 1);
                const int s_x = L ? 0 : 1, e_x = R ? bw : bw - 1;
                const int s_y = A ? 0 : 1, e_y = B ? bh : bh - 1;
                /* neighbor deltas per EO class */
                static const int8_t ND[4][4] = {
                    {0, -1, 0, 1}, {-1, 0, 1, 0},
                    {-1, -1, 1, 1}, {-1, 1, 1, -1}};
                const int dya = t < 4 ? ND[t][0] : 0;
                const int dxa = t < 4 ? ND[t][1] : 0;
                const int dyb = t < 4 ? ND[t][2] : 0;
                const int dxb = t < 4 ? ND[t][3] : 0;
                for (int row = 0; row < bh; row++) {
                    /* horizontal virtual boundaries (skip rows) */
                    if (t != 0 && t != 4) {
                        int skip = 0;
                        for (int v = 0; v < nvy; v++) {
                            const int vc = vby[v] / sy;
                            if (row == vc - y0 || row == vc - 1 - y0)
                                skip = 1;
                        }
                        if (skip)
                            continue;
                    }
                    /* row ranges (union via column mask) */
                    memset(colmask, 0, bw);
                    int got = 0;
                    if (t == 4) {
                        memset(colmask, 1, bw);
                        got = 1;
                    } else if (t == 0) {
                        if (e_x > s_x) {
                            memset(colmask + s_x, 1, e_x - s_x);
                            got = 1;
                        }
                    } else if (t == 1) {
                        if (row >= s_y && row < e_y) {
                            memset(colmask, 1, bw);
                            got = 1;
                        }
                    } else {
                        if (row >= 1 && row < bh - 1) {
                            if (e_x > s_x) {
                                memset(colmask + s_x, 1, e_x - s_x);
                                got = 1;
                            }
                        }
                        int rs, re;
                        if (row == 0) {
                            if (t == 2) {
                                rs = AL ? 0 : 1;
                                re = A ? e_x : 1;
                            } else {
                                rs = A ? s_x : bw - 1;
                                re = AR ? bw : bw - 1;
                            }
                            if (re > rs) {
                                memset(colmask + rs, 1, re - rs);
                                got = 1;
                            }
                        }
                        if (row == bh - 1) {
                            if (t == 2) {
                                rs = B ? s_x : bw - 1;
                                re = BR ? bw : bw - 1;
                            } else {
                                rs = BL ? 0 : 1;
                                re = B ? e_x : 1;
                            }
                            if (re > rs) {
                                memset(colmask + rs, 1, re - rs);
                                got = 1;
                            }
                        }
                    }
                    if (!got)
                        continue;
                    /* vertical virtual boundaries (clear columns) */
                    if (t != 1 && t != 4) {
                        for (int v = 0; v < nvx; v++) {
                            const int vc = vbx[v] / sx;
                            if (vc - x0 >= 0 && vc - x0 < bw)
                                colmask[vc - x0] = 0;
                            if (vc - 1 - x0 >= 0 && vc - 1 - x0 < bw)
                                colmask[vc - 1 - x0] = 0;
                        }
                    }
                    const int32_t *srow =
                        src + (size_t)(y0 + row) * cw + x0;
                    const int32_t *sra =
                        src + (size_t)(y0 + row + dya) * cw + x0 + dxa;
                    const int32_t *srb =
                        src + (size_t)(y0 + row + dyb) * cw + x0 + dxb;
                    int32_t *drow = dst + (size_t)(y0 + row) * cw + x0;
                    if (t == 4) {
                        const int shn = bd - 5;
                        for (int x = 0; x < bw; x++) {
                            const int32_t c = srow[x];
                            int32_t v = c + table[(c >> shn) & 31];
                            if (v < 0) v = 0;
                            if (v > pel_max) v = pel_max;
                            drow[x] = v;
                        }
                    } else {
                        for (int x = 0; x < bw; x++) {
                            if (!colmask[x])
                                continue;
                            const int32_t c = srow[x];
                            const int32_t da = c - sra[x];
                            const int32_t db = c - srb[x];
                            const int ea = (da > 0) - (da < 0);
                            const int eb = (db > 0) - (db < 0);
                            int32_t v = c + eo_off[ea + eb + 2];
                            if (v < 0) v = 0;
                            if (v > pel_max) v = pel_max;
                            drow[x] = v;
                        }
                    }
                }
            }
    }
    for (int comp = 0; comp < 3; comp++)
        free(snap[comp]);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&b_y);
    PyBuffer_Release(&b_cb);
    PyBuffer_Release(&b_cr);
    PyBuffer_Release(&b_rec);
    PyBuffer_Release(&b_fl);
    PyBuffer_Release(&b_sm);
    PyBuffer_Release(&b_tm);
    PyBuffer_Release(&b_sp);
    PyBuffer_Release(&b_vbx);
    PyBuffer_Release(&b_vby);
    if (!ok)
        return PyErr_NoMemory();
    Py_RETURN_NONE;
}
