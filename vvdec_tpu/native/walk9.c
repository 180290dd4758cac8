/* walk9.c — native inter-frame execution driver.
 *
 * Runs whole inter CUs (motion derivation + motion compensation +
 * residual reconstruction) over the flat CU/TU records, mirroring the
 * Python golden path (frame/recon_np.py _derive_motion/_dmvr_mc/_bdof_mc,
 * frame/inter_np.py mc_block/bi_average/bi_weighted/_apply_wp,
 * frame/dmvr_np.py) — reference parity: DecCu::xDeriveCUMV (DecCu.cpp:720),
 * InterPrediction::motionCompensation (InterPrediction.cpp:1372),
 * xProcessDMVR (:1847), applyBiOptFlow (:1290), WeightPrediction.cpp.
 *
 * Scope (CUs outside it fall back to the Python golden per TU):
 *   regular merge / MMVD / AMVP / SMVD, uni/bi MC with BCW and explicit
 *   weighted prediction, DMVR, BDOF, SBT / explicit-MTS / transform-skip /
 *   joint-CbCr residuals.  Excluded per CU: affine, GPM, CIIP, IBC.
 *   Excluded per frame (Python glue gates): LMCS, RPR, wraparound,
 *   treated-as-pic subpics, scaling lists, ACT.
 *
 * Included from cabac.c after walk8.c (uses MotionCtx, mc_block_core,
 * itx_block_core).
 */

#define IX_MAX_CU 128
#define IX_MAX_MERGE 6
#define IX_BDOF_REGION 16
#define IX_DMVR_SUBCU 16
#define IX_DMVR_ITER 2

/* params vector indices (must match frame/inter_native.py IP_*) */
enum {
    IP_BIT_DEPTH, IP_SUB_W, IP_SUB_H, IP_NUM_COMP, IP_CTU_SIZE,
    IP_DMVR_EN, IP_BDOF_EN, IP_BCW_EN, IP_FPEL_MMVD, IP_JCCR_SIGN,
    IP_INTERNAL_MINUS_INPUT, IP_QP_BD_OFFSET, IP_MTS_EN, IP_N_SLICES,
    IP_COUNT
};

/* per-slice extra table columns (int32 [n_slices, IS_NF]) */
enum { IS_DEP_QUANT, IS_WP_P_GATE, IS_WP_B_GATE, IS_IS_B, IS_NF };

/* shared run-state (int32[4]): last HMVP reset key (row, tile), fixup
 * count, error flag */
enum { IST_ROW, IST_TILE, IST_FIX_N, IST_ERR };

static const int IX_BCW_W[5] = {-2, 3, 4, 5, 10};
static const int IX_BCW_INTERN[5] = {2, 0, 1, 3, 4};

typedef struct {
    const int32_t *p; /* plane */
    int W, H;         /* plane dims */
    int lo_x, lo_y, hi_x, hi_y;
} IxSampler;

static inline int32_t ix_samp(const IxSampler *s, int y, int x)
{
    if (x < s->lo_x) x = s->lo_x;
    if (x > s->hi_x) x = s->hi_x;
    if (y < s->lo_y) y = s->lo_y;
    if (y > s->hi_y) y = s->hi_y;
    return s->p[(size_t)y * s->W + x];
}

typedef struct {
    PyObject_HEAD
    PyObject *mc_obj;
    MotionCtx *mc;
    Py_buffer b_tu_rec, b_params, b_slice_ex, b_wp_prm, b_wp_pres,
        b_order, b_fix, b_state, b_bank, b_troff, b_if_luma, b_if_chroma,
        b_if_bilin, b_if_alt;
    Py_buffer b_reco[3], b_coef[3];
    const int32_t *tu_rec;
    int n_tus;
    int32_t *reco[3];
    const int32_t *coef[3];
    int pw[3], ph[3]; /* per-comp plane dims */
    int32_t *order_map;
    const int32_t *ip;       /* IP_COUNT params */
    const int32_t *slice_ex; /* [n_slices][IS_NF] */
    const int32_t *wp_prm;   /* [n_slices][2][16][3][3] (w, o, denom) */
    const uint8_t *wp_pres;  /* [n_slices][2][16] */
    int32_t *fix;            /* [cap][6] */
    int fix_cap;
    int32_t *state; /* IST_* */
    const int32_t *bank;
    const int32_t *troff; /* [3][8] offsets into bank, -1 invalid */
    const int32_t *if_luma;   /* [16][8] */
    const int32_t *if_chroma; /* [32][4] */
    const int32_t *if_bilin;  /* [16][2] */
    const int32_t *if_alt;    /* [8] */
    /* mutable aliases into MotionCtx-shared buffers */
    int32_t *hist;
    int32_t *hist_n;
    int32_t *side;
    int8_t *mi_ref;
    int32_t *mi_mv;
    /* reference planes: per (lst, ref) -> sampler per comp */
    Py_buffer *ref_bufs;
    int n_ref_bufs;
    IxSampler refs[2][MC_MAX_REF][3];
    int nref[2];
    /* scratch */
    int32_t *pred[3];          /* [128*128] final CU prediction */
    int32_t *part[2][3];       /* per-list intermediates */
    int32_t *bl[2];            /* DMVR bilinear (132*132) */
    int32_t *ext[2];           /* BDOF extended blocks (18*18) */
    int32_t *gx[2], *gy[2];    /* BDOF gradients */
    int64_t *resi, *jccr;      /* residual buffers (64*64) */
} InterCtx;

/* ---------------- small helpers ---------------- */

static inline int32_t ix_clip18(int64_t v)
{
    return v < -131072 ? -131072 : (v > 131071 ? 131071 : (int32_t)v);
}

static inline int32_t ix_clip_pel(int64_t v, int pel_max)
{
    return v < 0 ? 0 : (v > pel_max ? pel_max : (int32_t)v);
}

/* clipMvInPic (inter_np.clip_mv, no wraparound / subpics) */
static void ix_clip_mv(const InterCtx *ic, int32_t mv[2], int x, int y)
{
    int W = ic->pw[0], H = ic->ph[0], ctu = ic->ip[IP_CTU_SIZE];
    int32_t hor_max = (W + 8 - x - 1) << 4;
    int32_t hor_min = (-ctu - 8 - x + 1) << 4;
    int32_t ver_max = (H + 8 - y - 1) << 4;
    int32_t ver_min = (-ctu - 8 - y + 1) << 4;
    mv[0] = mv[0] > hor_max ? hor_max : (mv[0] < hor_min ? hor_min : mv[0]);
    mv[1] = mv[1] > ver_max ? ver_max : (mv[1] < ver_min ? ver_min : mv[1]);
}

/* one MC block through a sampler via mc_block_core (clamp window only) */
static int ix_mc(const InterCtx *ic, const IxSampler *s, int bx, int by,
                 int bw, int bh, int32_t mvx, int32_t mvy, int comp,
                 int intermediate, int alt_hpel, int32_t *out)
{
    int sub_w = ic->ip[IP_SUB_W], sub_h = ic->ip[IP_SUB_H];
    int fx_bits = comp ? 4 + (sub_w - 1) : 4;
    int fy_bits = comp ? 4 + (sub_h - 1) : 4;
    int ix = mvx >> fx_bits, iy = mvy >> fy_bits;
    int fx = mvx & ((1 << fx_bits) - 1);
    int fy = mvy & ((1 << fy_bits) - 1);
    if (comp) {
        fx <<= 5 - fx_bits;
        fy <<= 5 - fy_bits;
    }
    int taps = comp ? 4 : 8;
    const int32_t *cx = NULL, *cy = NULL;
    if (fx)
        cx = comp ? ic->if_chroma + (size_t)fx * 4
                  : ((alt_hpel && fx == 8) ? ic->if_alt
                                           : ic->if_luma + (size_t)fx * 8);
    if (fy)
        cy = comp ? ic->if_chroma + (size_t)fy * 4
                  : ((alt_hpel && fy == 8) ? ic->if_alt
                                           : ic->if_luma + (size_t)fy * 8);
    return mc_block_core(s->p, s->W, s->H, bx + ix, by + iy, bw, bh, cx, cy,
                         taps, ic->ip[IP_BIT_DEPTH], intermediate, -1,
                         s->lo_x, s->lo_y, s->hi_x, s->hi_y, out);
}

/* MC with explicit integer position + 1/32(chroma)|1/16(luma) fraction
 * (dmvr_np.mc_from_view); fraction already normalized by caller */
static int ix_mc_at(const InterCtx *ic, const IxSampler *s, int bx, int by,
                    int bw, int bh, int int_x, int int_y, int fx, int fy,
                    int comp, int intermediate, int alt_hpel, int32_t *out)
{
    int taps = comp ? 4 : 8;
    const int32_t *cx = NULL, *cy = NULL;
    if (fx)
        cx = comp ? ic->if_chroma + (size_t)fx * 4
                  : ((alt_hpel && fx == 8) ? ic->if_alt
                                           : ic->if_luma + (size_t)fx * 8);
    if (fy)
        cy = comp ? ic->if_chroma + (size_t)fy * 4
                  : ((alt_hpel && fy == 8) ? ic->if_alt
                                           : ic->if_luma + (size_t)fy * 8);
    return mc_block_core(s->p, s->W, s->H, bx + int_x, by + int_y, bw, bh,
                         cx, cy, taps, ic->ip[IP_BIT_DEPTH], intermediate,
                         -1, s->lo_x, s->lo_y, s->hi_x, s->hi_y, out);
}

/* luma MC + BDOF extension borders (mc_from_view bio_ext=True).
 * ext: int32 [(bh+2)][(bw+2)]. */
static int ix_mc_ext(const InterCtx *ic, const IxSampler *s, int bx, int by,
                     int bw, int bh, int int_x, int int_y, int fx, int fy,
                     int alt_hpel, int32_t *ext)
{
    int bd = ic->ip[IP_BIT_DEPTH];
    int head = 14 - bd;
    if (head < 2) head = 2;
    int stride = bw + 2;
    static _Thread_local int32_t blk[IX_BDOF_REGION * IX_BDOF_REGION];
    if (ix_mc_at(ic, s, bx, by, bw, bh, int_x, int_y, fx, fy, 0, 1,
                 alt_hpel, blk) < 0)
        return -1;
    for (int r = 0; r < bh; r++)
        memcpy(ext + (size_t)(r + 1) * stride + 1, blk + (size_t)r * bw,
               sizeof(int32_t) * bw);
    int rx = bx + int_x - 1 + (fx >= 8 ? 1 : 0);
    int ry = by + int_y - 1 + (fy >= 8 ? 1 : 0);
    for (int c = 0; c < bw + 2; c++) {
        ext[c] = (ix_samp(s, ry, rx + c) << head) - IF_OFFS;
        ext[(size_t)(bh + 1) * stride + c] =
            (ix_samp(s, ry + bh + 1, rx + c) << head) - IF_OFFS;
    }
    for (int r = 1; r <= bh; r++) {
        ext[(size_t)r * stride] =
            (ix_samp(s, ry + r, rx) << head) - IF_OFFS;
        ext[(size_t)r * stride + bw + 1] =
            (ix_samp(s, ry + r, rx + bw + 1) << head) - IF_OFFS;
    }
    return 0;
}

/* ---------------- combination kernels ---------------- */

static void ix_bi_average(const int32_t *a, const int32_t *b, int n, int bd,
                          int pel_max, int32_t *out)
{
    int head = 14 - bd;
    if (head < 2) head = 2;
    int shift = head + 1;
    int32_t offset = (1 << (shift - 1)) + 2 * IF_OFFS;
    for (int i = 0; i < n; i++)
        out[i] = ix_clip_pel((a[i] + b[i] + offset) >> shift, pel_max);
}

static void ix_bi_weighted(const int32_t *a, const int32_t *b, int n,
                           int bd, int pel_max, int bcw_fwd, int32_t *out)
{
    int w1 = IX_BCW_W[IX_BCW_INTERN[bcw_fwd]];
    int w0 = 8 - w1;
    int head = 14 - bd;
    if (head < 2) head = 2;
    int shift = head + 3;
    int32_t offset = (1 << (shift - 1)) + (IF_OFFS << 3);
    for (int i = 0; i < n; i++)
        out[i] = ix_clip_pel(((int64_t)a[i] * w0 + (int64_t)b[i] * w1
                              + offset) >> shift,
                             pel_max);
}

/* explicit weighted prediction (recon_np._apply_wp).  parts0/parts1 are
 * 14-bit intermediates; uni when parts1 == NULL. */
static void ix_apply_wp(const InterCtx *ic, int slice, int lst0, int ref0,
                        int lst1, int ref1, const int32_t *p0,
                        const int32_t *p1, int n, int comp, int32_t *out)
{
    int bd = ic->ip[IP_BIT_DEPTH];
    int pel_max = (1 << bd) - 1;
    int shift_num = 14 - bd;
    if (shift_num < 2) shift_num = 2;
    int32_t offs = 1 << 13;
    const int32_t *w0 = ic->wp_prm
        + (((size_t)slice * 2 + lst0) * 16 + ref0) * 9 + (size_t)comp * 3;
    if (p1 != NULL) {
        const int32_t *w1 = ic->wp_prm
            + (((size_t)slice * 2 + lst1) * 16 + ref1) * 9
            + (size_t)comp * 3;
        int denom = w0[2];
        int shift = denom + 1 + shift_num;
        int64_t rnd = ((int64_t)1 << shift) >> 1;
        int64_t off = w0[1] + w1[1];
        for (int i = 0; i < n; i++) {
            int64_t v = ((int64_t)w0[0] * (p0[i] + offs)
                         + (int64_t)w1[0] * (p1[i] + offs) + rnd
                         + (off << (shift - 1))) >> shift;
            out[i] = ix_clip_pel(v, pel_max);
        }
    } else {
        int denom = w0[2];
        int shift = denom + shift_num;
        int64_t rnd = shift > 0 ? ((int64_t)1 << shift) >> 1 : 0;
        for (int i = 0; i < n; i++) {
            int64_t v = (((int64_t)w0[0] * (p0[i] + offs) + rnd) >> shift)
                + w0[1];
            out[i] = ix_clip_pel(v, pel_max);
        }
    }
}

/* ---------------- BDOF (dmvr_np.bdof_blend) ---------------- */

static inline int64_t ix_rshift_msb(int64_t numer, int64_t denom)
{
    int msb = 0;
    while (msb < 32 && denom >= ((int64_t)1 << msb))
        msb++;
    return numer >> (msb - 1);
}

static void ix_bdof_blend(InterCtx *ic, int32_t *ext0, int32_t *ext1,
                          int w, int h, int32_t *out, int out_stride)
{
    int bd = ic->ip[IP_BIT_DEPTH];
    int pel_max = (1 << bd) - 1;
    int stride = w + 2;
    int32_t *gx0 = ic->gx[0], *gy0 = ic->gy[0];
    int32_t *gx1 = ic->gx[1], *gy1 = ic->gy[1];
    int32_t *exts[2] = {ext0, ext1};
    int32_t *gxs[2] = {gx0, gx1};
    int32_t *gys[2] = {gy0, gy1};
    for (int l = 0; l < 2; l++) {
        int32_t *e = exts[l], *gx = gxs[l], *gy = gys[l];
        memset(gx, 0, sizeof(int32_t) * stride * (h + 2));
        memset(gy, 0, sizeof(int32_t) * stride * (h + 2));
        for (int r = 1; r <= h; r++)
            for (int c = 1; c <= w; c++) {
                gx[r * stride + c] = (e[r * stride + c + 1] >> 6)
                    - (e[r * stride + c - 1] >> 6);
                gy[r * stride + c] = (e[(r + 1) * stride + c] >> 6)
                    - (e[(r - 1) * stride + c] >> 6);
            }
        int32_t *arrs[3] = {gx, gy, e};
        for (int k = 0; k < 3; k++) {
            int32_t *a = arrs[k];
            for (int r = 1; r <= h; r++) {
                a[r * stride] = a[r * stride + 1];
                a[r * stride + w + 1] = a[r * stride + w];
            }
            memcpy(a, a + stride, sizeof(int32_t) * stride);
            memcpy(a + (size_t)(h + 1) * stride, a + (size_t)h * stride,
                   sizeof(int32_t) * stride);
        }
    }
    int shift_num = 14 + 1 - bd;
    int32_t offset = (1 << (shift_num - 1)) + 2 * IF_OFFS;
    for (int yu = 0; yu < (h >> 2); yu++)
        for (int xu = 0; xu < (w >> 2); xu++) {
            int ya = yu * 4, xa = xu * 4;
            int64_t sum_abs_gx = 0, sum_abs_gy = 0;
            int64_t sum_dix = 0, sum_diy = 0, sum_sign_gy_gx = 0;
            for (int r = 0; r < 6; r++)
                for (int c = 0; c < 6; c++) {
                    size_t p = (size_t)(ya + r) * stride + (xa + c);
                    int32_t tgx = (gx0[p] + gx1[p]) >> 1;
                    int32_t tgy = (gy0[p] + gy1[p]) >> 1;
                    int32_t tdi = (ext1[p] >> 4) - (ext0[p] >> 4);
                    int sgx = (tgx > 0) - (tgx < 0);
                    int sgy = (tgy > 0) - (tgy < 0);
                    sum_abs_gx += tgx < 0 ? -tgx : tgx;
                    sum_abs_gy += tgy < 0 ? -tgy : tgy;
                    sum_dix += (int64_t)sgx * tdi;
                    sum_diy += (int64_t)sgy * tdi;
                    sum_sign_gy_gx += (int64_t)sgy * tgx;
                }
            int64_t tmpx = sum_abs_gx == 0
                ? 0 : ix_rshift_msb(sum_dix * 4, sum_abs_gx);
            if (tmpx < -15) tmpx = -15;
            if (tmpx > 15) tmpx = 15;
            int64_t mains = sum_sign_gy_gx >> 12;
            int64_t secs = sum_sign_gy_gx & 4095;
            int64_t tmp_data = ((tmpx * mains) * 4096 + tmpx * secs) >> 1;
            int64_t tmpy = sum_abs_gy == 0
                ? 0 : ix_rshift_msb(sum_diy * 4 - tmp_data, sum_abs_gy);
            if (tmpy < -15) tmpy = -15;
            if (tmpy > 15) tmpy = 15;
            for (int r = 0; r < 4; r++)
                for (int c = 0; c < 4; c++) {
                    size_t p = (size_t)(ya + 1 + r) * stride
                        + (xa + 1 + c);
                    int64_t b = tmpx * (gx0[p] - gx1[p])
                        + tmpy * (gy0[p] - gy1[p]);
                    out[(size_t)(ya + r) * out_stride + xa + c] =
                        ix_clip_pel(((int64_t)ext0[p] + ext1[p] + b
                                     + offset) >> shift_num,
                                    pel_max);
                }
        }
}

/* ---------------- DMVR (dmvr_np) ---------------- */

/* 2-tap bilinear prediction at 10-bit precision (dmvr_np.bilinear_pred);
 * out [h][w] */
static void ix_bilinear(const InterCtx *ic, const IxSampler *s, int x,
                        int y, int w, int h, int32_t mvx, int32_t mvy,
                        int32_t *out)
{
    int bd = ic->ip[IP_BIT_DEPTH];
    int ix = mvx >> 4, iy = mvy >> 4;
    int fx = mvx & 15, fy = mvy & 15;
    int sh1 = 4 - (10 - bd);
    const int32_t *bfx = ic->if_bilin + (size_t)fx * 2;
    const int32_t *bfy = ic->if_bilin + (size_t)fy * 2;
    if (fx == 0 && fy == 0) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++)
                out[(size_t)r * w + c] =
                    ix_samp(s, y + iy + r, x + ix + c) << (10 - bd);
        return;
    }
    if (fy == 0) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int64_t a = (int64_t)ix_samp(s, y + iy + r, x + ix + c)
                        * bfx[0]
                    + (int64_t)ix_samp(s, y + iy + r, x + ix + c + 1)
                        * bfx[1];
                out[(size_t)r * w + c] =
                    (int32_t)((a + ((int64_t)1 << (sh1 - 1))) >> sh1);
            }
        return;
    }
    if (fx == 0) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int64_t a = (int64_t)ix_samp(s, y + iy + r, x + ix + c)
                        * bfy[0]
                    + (int64_t)ix_samp(s, y + iy + r + 1, x + ix + c)
                        * bfy[1];
                out[(size_t)r * w + c] =
                    (int32_t)((a + ((int64_t)1 << (sh1 - 1))) >> sh1);
            }
        return;
    }
    /* both fractions: horizontal pass into a (h+1) x w temp */
    static _Thread_local int32_t tmp[(IX_MAX_CU + 5) * (IX_MAX_CU + 5)];
    for (int r = 0; r < h + 1; r++)
        for (int c = 0; c < w; c++) {
            int64_t a = (int64_t)ix_samp(s, y + iy + r, x + ix + c) * bfx[0]
                + (int64_t)ix_samp(s, y + iy + r, x + ix + c + 1) * bfx[1];
            tmp[(size_t)r * w + c] =
                (int32_t)((a + ((int64_t)1 << (sh1 - 1))) >> sh1);
        }
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++) {
            int64_t a = (int64_t)tmp[(size_t)r * w + c] * bfy[0]
                + (int64_t)tmp[(size_t)(r + 1) * w + c] * bfy[1];
            out[(size_t)r * w + c] = (int32_t)((a + 8) >> 4);
        }
}

/* SAD over even rows (dmvr_np._sad_sub2) */
static int64_t ix_sad_sub2(const int32_t *a, int stride_a, const int32_t *b,
                           int stride_b, int w, int h)
{
    int64_t s = 0;
    for (int r = 0; r < h; r += 2) {
        const int32_t *ra = a + (size_t)r * stride_a;
        const int32_t *rb = b + (size_t)r * stride_b;
        for (int c = 0; c < w; c++) {
            int32_t d = ra[c] - rb[c];
            s += d < 0 ? -d : d;
        }
    }
    return s;
}

static int64_t ix_div_for_maxq7(int64_t n, int64_t d)
{
    int sign = 0;
    if (n < 0) {
        sign = 1;
        n = -n;
    }
    int64_t q = 0;
    d <<= 3;
    if (n >= d) {
        n -= d;
        q++;
    }
    q <<= 1;
    d >>= 1;
    if (n >= d) {
        n -= d;
        q++;
    }
    q <<= 1;
    if (n >= (d >> 1))
        q++;
    return sign ? -q : q;
}

static void ix_subpel_delta(int64_t sad_c, int64_t sad_l, int64_t sad_t,
                            int64_t sad_r, int64_t sad_b, int *dx, int *dy)
{
    int out[2] = {0, 0};
    int64_t s1s[2] = {sad_l, sad_t}, s3s[2] = {sad_r, sad_b};
    for (int k = 0; k < 2; k++) {
        int64_t s1 = s1s[k], s3 = s3s[k];
        int64_t num = (s1 - s3) * 16;
        int64_t den = s1 + s3 - 2 * sad_c;
        if (den != 0) {
            if (s1 != sad_c && s3 != sad_c)
                out[k] = (int)ix_div_for_maxq7(num, den);
            else
                out[k] = s1 == sad_c ? -8 : 8;
        }
    }
    *dx = out[0];
    *dy = out[1];
}

/* 25-point search + parametric sub-pel (dmvr_np.dmvr_search).
 * bl0/bl1: CU-wide bilinear buffers [(h+4)][(w+4)] with centre at (2,2).
 * Returns min_cost; fills dmv (1/16 units). */
static int64_t ix_dmvr_search(const int32_t *bl0, const int32_t *bl1,
                              int blw, int xs, int ys, int dx, int dy,
                              int dmv[2])
{
    int cx = 2 + xs, cy = 2 + ys;
#define BSAD(hor, ver)                                                    \
    ix_sad_sub2(bl0 + (size_t)(cy + (ver)) * blw + cx + (hor), blw,       \
                bl1 + (size_t)(cy - (ver)) * blw + cx - (hor), blw, dx,   \
                dy)
    int64_t center = BSAD(0, 0);
    int64_t min_cost = center - (center >> 2);
    dmv[0] = 0;
    dmv[1] = 0;
    if (min_cost < (int64_t)dx * dy)
        return min_cost;
    int64_t sads[5][5];
    int best_h = 0, best_v = 0;
    for (int ver = -2; ver <= 2; ver++)
        for (int hor = -2; hor <= 2; hor++)
            sads[ver + 2][hor + 2] =
                (ver == 0 && hor == 0) ? min_cost : BSAD(hor, ver);
    for (int ver = -2; ver <= 2; ver++)
        for (int hor = -2; hor <= 2; hor++) {
            int64_t c = sads[ver + 2][hor + 2];
            if (c < min_cost) {
                min_cost = c;
                best_h = hor;
                best_v = ver;
            }
        }
    int tx = best_h * 16, ty = best_v * 16;
    if (tx != 32 && tx != -32 && ty != 32 && ty != -32) {
        int bx = best_h + 2, by = best_v + 2;
        int ddx, ddy;
        ix_subpel_delta(sads[by][bx], sads[by][bx - 1], sads[by - 1][bx],
                        sads[by][bx + 1], sads[by + 1][bx], &ddx, &ddy);
        tx += ddx;
        ty += ddy;
    }
    dmv[0] = tx;
    dmv[1] = ty;
    return min_cost;
#undef BSAD
}

/* ---------------- derivation helpers ---------------- */

/* MMVD (inter_np.derive_mmvd) — bases = first entries of the merge list */
static void ix_derive_mmvd(const InterCtx *ic, const int32_t *cu,
                           const int32_t *cands, int n_cands,
                           int32_t ent[MC_ENT])
{
    const MotionCtx *mc = ic->mc;
    int base_idx = cu[CU_MMVD_IDX] / 32;
    int tmp = cu[CU_MMVD_IDX] - base_idx * 32;
    int step = tmp / 4;
    int pos = tmp - step * 4;
    int32_t offset = (1 << step) << 2;
    if (ic->ip[IP_FPEL_MMVD])
        offset <<= 2;
    if (base_idx >= n_cands)
        base_idx = n_cands - 1;
    const int32_t *base = cands + (size_t)base_idx * MC_ENT;
    int r0 = base[5], r1 = base[6];
    int32_t offx = 0, offy = 0;
    switch (pos) {
    case 0: offx = offset; break;
    case 1: offx = -offset; break;
    case 2: offy = offset; break;
    default: offy = -offset; break;
    }
    if (r0 >= 0 && r1 >= 0) {
        int poc0 = mc->ref_pocs[r0];
        int poc1 = mc->ref_pocs[MC_MAX_REF + r1];
        int cur = mc->poc;
        int32_t mv0x = offx, mv0y = offy, mv1x, mv1y;
        if ((poc0 - cur) == (poc1 - cur)) {
            mv1x = offx;
            mv1y = offy;
        } else if ((poc1 - cur < 0 ? cur - poc1 : poc1 - cur)
                   > (poc0 - cur < 0 ? cur - poc0 : poc0 - cur)) {
            mv1x = offx;
            mv1y = offy;
            int32_t scale = mc_dist_scale(cur, poc0, cur, poc1);
            mv0x = mc_scale_comp(scale, mv1x);
            mv0y = mc_scale_comp(scale, mv1y);
        } else {
            int32_t scale = mc_dist_scale(cur, poc1, cur, poc0);
            mv0x = offx;
            mv0y = offy;
            mv1x = mc_scale_comp(scale, mv0x);
            mv1y = mc_scale_comp(scale, mv0y);
        }
        ent[0] = 3;
        ent[1] = base[1] + mv0x;
        ent[2] = base[2] + mv0y;
        ent[3] = base[3] + mv1x;
        ent[4] = base[4] + mv1y;
        ent[5] = r0;
        ent[6] = r1;
        ent[7] = base[7];
        ent[8] = base[8];
    } else if (r0 >= 0) {
        ent[0] = 1;
        ent[1] = base[1] + offx;
        ent[2] = base[2] + offy;
        ent[3] = 0;
        ent[4] = 0;
        ent[5] = r0;
        ent[6] = -1;
        ent[7] = base[7];
        ent[8] = base[8];
    } else {
        ent[0] = 2;
        ent[1] = 0;
        ent[2] = 0;
        ent[3] = base[3] + offx;
        ent[4] = base[4] + offy;
        ent[5] = -1;
        ent[6] = r1;
        ent[7] = base[7];
        ent[8] = base[8];
    }
}

/* MotionHist.add (exact 9-field dedup) over the shared buf/nbuf */
static void ix_hist_add(InterCtx *ic, const int32_t ent[MC_ENT])
{
    int n = ic->hist_n[0];
    int found = -1;
    for (int i = 0; i < n; i++)
        if (memcmp(ic->hist + (size_t)i * MC_ENT, ent,
                   MC_ENT * sizeof(int32_t)) == 0) {
            found = i;
            break;
        }
    if (found >= 0) {
        memmove(ic->hist + (size_t)found * MC_ENT,
                ic->hist + (size_t)(found + 1) * MC_ENT,
                (size_t)(n - 1 - found) * MC_ENT * sizeof(int32_t));
        memcpy(ic->hist + (size_t)(n - 1) * MC_ENT, ent,
               MC_ENT * sizeof(int32_t));
    } else if (n == MC_HMVP) {
        memmove(ic->hist, ic->hist + MC_ENT,
                (size_t)(MC_HMVP - 1) * MC_ENT * sizeof(int32_t));
        memcpy(ic->hist + (size_t)(MC_HMVP - 1) * MC_ENT, ent,
               MC_ENT * sizeof(int32_t));
    } else {
        memcpy(ic->hist + (size_t)n * MC_ENT, ent,
               MC_ENT * sizeof(int32_t));
        ic->hist_n[0] = n + 1;
    }
}

/* spanMotionInfo (inter_np.span_motion) */
static void ix_span_motion(InterCtx *ic, const int32_t *cu,
                           const int32_t ent[MC_ENT])
{
    const MotionCtx *mc = ic->mc;
    int y4a = cu[CU_Y] >> 2, y4b = (cu[CU_Y] + cu[CU_H]) >> 2;
    int x4a = cu[CU_X] >> 2, x4b = (cu[CU_X] + cu[CU_W]) >> 2;
    for (int lst = 0; lst < 2; lst++) {
        int ref = ent[5 + lst];
        for (int y4 = y4a; y4 < y4b; y4++)
            for (int x4 = x4a; x4 < x4b; x4++) {
                size_t p = (size_t)y4 * mc->w4 + x4;
                if (ref >= 0) {
                    ic->mi_ref[p * 2 + lst] = (int8_t)ref;
                    ic->mi_mv[p * 4 + lst * 2] = ent[1 + 2 * lst];
                    ic->mi_mv[p * 4 + lst * 2 + 1] = ent[2 + 2 * lst];
                } else {
                    ic->mi_ref[p * 2 + lst] = -1;
                    ic->mi_mv[p * 4 + lst * 2] = 0;
                    ic->mi_mv[p * 4 + lst * 2 + 1] = 0;
                }
            }
    }
}

/* ---------------- residual (reconstruct_tu subset) ---------------- */

/* transform-skip dequant (recon_np.dequant_block ts=True, no BDPCM) */
static void ix_ts_residual(const InterCtx *ic, const int32_t *tu, int comp,
                           int64_t *out)
{
    int x = tu[TUF_BX0 + comp * 4], y = tu[TUF_BY0 + comp * 4];
    int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
    int max_x = tu[TUF_MSX0 + comp], max_y = tu[TUF_MSY0 + comp];
    int qp = comp ? tu[TUF_CQP0 + comp - 1]
                  : tu[TUF_QP] + ic->ip[IP_QP_BD_OFFSET];
    int qp_min = 4 + 6 * ic->ip[IP_INTERNAL_MINUS_INPUT];
    if (qp < qp_min)
        qp = qp_min;
    int qp_per = qp / 6, qp_rem = qp % 6;
    int right_shift = 6 - qp_per;
    int64_t scale = ITX_INV_QUANT_SCALES[0][qp_rem];
    int target_bd = 64 + right_shift - 7;
    if (target_bd > ITX_MAX_TR_RANGE + 1)
        target_bd = ITX_MAX_TR_RANGE + 1;
    int64_t input_max = ((int64_t)1 << (target_bd - 1)) - 1;
    const int32_t *coef = ic->coef[comp];
    int W = ic->pw[comp];
    memset(out, 0, sizeof(int64_t) * (size_t)w * h);
    for (int yy = 0; yy <= max_y; yy++)
        for (int xx = 0; xx <= max_x; xx++) {
            int64_t lv = coef[(size_t)(y + yy) * W + (x + xx)];
            if (lv == 0)
                continue;
            int64_t cl = itx_clip(lv, -input_max - 1, input_max);
            int64_t d;
            if (right_shift > 0)
                d = (cl * scale + ((int64_t)1 << (right_shift - 1)))
                    >> right_shift;
            else
                d = (cl * scale) << (-right_shift);
            out[(size_t)yy * w + xx] =
                itx_clip(d, ITX_CLIP_MIN, ITX_CLIP_MAX);
        }
}

/* TrQuant::getTrTypes subset for inter TUs (recon_np.get_tr_types):
 * kind 0=DCT2, 1=DST7, 2=DCT8; returns 0 ok, -1 if matrix missing */
static int ix_tr_types(const InterCtx *ic, const int32_t *cu,
                       const int32_t *tu, int comp, int *kh, int *kv)
{
    *kh = 0;
    *kv = 0;
    if (!ic->ip[IP_MTS_EN])
        return 0;
    if (cu[CU_SBT_INFO] && comp == 0) {
        int sbt_idx = cu[CU_SBT_INFO] & 0xF;
        int pos = (cu[CU_SBT_INFO] >> 4) & 3;
        int tw = tu[TUF_BW0], th = tu[TUF_BH0];
        if (sbt_idx == 1 || sbt_idx == 3) {
            if (th > 32)
                return 0;
            *kh = pos == 0 ? 2 : 1;
            *kv = 1;
        } else {
            if (tw > 32)
                return 0;
            *kh = 1;
            *kv = pos == 0 ? 2 : 1;
        }
        return 0;
    }
    int mts = comp == 0 ? tu[TUF_MTS0] : 0;
    if (comp != 0 || mts <= 1)
        return 0;
    *kh = (mts == 2 || mts == 4) ? 1 : 2;
    *kv = (mts == 2 || mts == 3) ? 1 : 2;
    return 0;
}

static const int32_t *ix_tr_matrix(const InterCtx *ic, int kind, int n)
{
    int log2n = 0;
    while ((1 << log2n) < n)
        log2n++;
    int32_t off = ic->troff[(size_t)kind * 8 + log2n];
    return off < 0 ? NULL : ic->bank + off;
}

/* residual of one coded TU component into ic->resi (int64 [h][w]).
 * Returns 0 ok, -1 must not happen (caller pre-checked eligibility). */
static int ix_tu_residual(const InterCtx *ic, const int32_t *cu,
                          const int32_t *tu, int comp, int64_t *out)
{
    int x = tu[TUF_BX0 + comp * 4], y = tu[TUF_BY0 + comp * 4];
    int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
    if (tu[TUF_MTS0 + comp] == 1) { /* MTS_SKIP */
        ix_ts_residual(ic, tu, comp, out);
        return 0;
    }
    int kh, kv;
    ix_tr_types(ic, cu, tu, comp, &kh, &kv);
    const int32_t *mh = ix_tr_matrix(ic, kh, w);
    const int32_t *mv = ix_tr_matrix(ic, kv, h);
    if (mh == NULL || mv == NULL)
        return -1;
    int qp = comp ? tu[TUF_CQP0 + comp - 1]
                  : tu[TUF_QP] + ic->ip[IP_QP_BD_OFFSET];
    int dq = ic->slice_ex[(size_t)cu[CU_SLICE_IDX] * IS_NF + IS_DEP_QUANT];
    itx_block_core(ic->coef[comp], ic->pw[comp], x, y, w, h, qp, dq,
                   tu[TUF_MSX0 + comp], tu[TUF_MSY0 + comp],
                   ic->ip[IP_BIT_DEPTH], mh, mv, NULL, out);
    return 0;
}

/* reconstruct one TU of an inter CU (reconstruct_tu, no LMCS/ACT) */
static int ix_recon_tu(InterCtx *ic, const int32_t *cu, int tu_idx)
{
    const int32_t *tu = ic->tu_rec + (size_t)tu_idx * TUF_NF;
    int num_comp = ic->ip[IP_NUM_COMP];
    int pel_max = (1 << ic->ip[IP_BIT_DEPTH]) - 1;
    int joint = tu[TUF_JOINT_CBCR];
    int neg = ic->ip[IP_JCCR_SIGN];
    for (int comp = 0; comp < 3; comp++) {
        if (comp == 0) {
            if (!tu[TUF_BW0] || !cu[CU_HAS_LUMA])
                continue;
        } else {
            if (num_comp < 2 || !tu[TUF_BW1] || !cu[CU_HAS_CHROMA])
                continue;
        }
        int x = tu[TUF_BX0 + comp * 4], y = tu[TUF_BY0 + comp * 4];
        int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
        int cu_bx = comp == 0 ? cu[CU_X] : cu[CU_CX];
        int cu_by = comp == 0 ? cu[CU_Y] : cu[CU_CY];
        int pred_stride = comp == 0 ? cu[CU_W] : cu[CU_CW];
        const int32_t *pred = ic->pred[comp]
            + (size_t)(y - cu_by) * pred_stride + (x - cu_bx);
        int32_t *reco = ic->reco[comp] + (size_t)y * ic->pw[comp] + x;
        int W = ic->pw[comp];
        const int64_t *resi = NULL;
        if (comp == 1 && joint) {
            int coded = (joint >> 1) ? 1 : 2;
            if (ix_tu_residual(ic, cu, tu, coded, ic->resi) < 0)
                return -1;
            int n = w * h;
            if (joint == 1) { /* coded Cr; Cb = (±Cr) >> 1 */
                for (int i = 0; i < n; i++) {
                    int64_t r = ic->resi[i];
                    ic->jccr[i] = r;
                    ic->resi[i] = neg ? ((-r) >> 1) : (r >> 1);
                }
            } else if (joint == 2) { /* coded Cb; Cr = (±Cb) >> 1 */
                for (int i = 0; i < n; i++) {
                    int64_t r = ic->resi[i];
                    ic->jccr[i] = neg ? ((-r) >> 1) : (r >> 1);
                }
            } else { /* coded Cb; Cr = ±Cb */
                for (int i = 0; i < n; i++) {
                    int64_t r = ic->resi[i];
                    ic->jccr[i] = neg ? -r : r;
                }
            }
            resi = ic->resi;
        } else if (comp == 2 && joint) {
            resi = ic->jccr;
        } else if (tu[TUF_CBF0 + comp]) {
            if (ix_tu_residual(ic, cu, tu, comp, ic->resi) < 0)
                return -1;
            resi = ic->resi;
        }
        if (resi != NULL) {
            for (int r = 0; r < h; r++)
                for (int c = 0; c < w; c++)
                    reco[(size_t)r * W + c] = ix_clip_pel(
                        pred[(size_t)r * pred_stride + c]
                            + resi[(size_t)r * w + c],
                        pel_max);
        } else {
            for (int r = 0; r < h; r++)
                for (int c = 0; c < w; c++)
                    reco[(size_t)r * W + c] = ix_clip_pel(
                        pred[(size_t)r * pred_stride + c], pel_max);
        }
    }
    /* order map over the luma-granularity rect */
    {
        int x, y, w, h;
        if (tu[TUF_BW0]) {
            x = tu[TUF_BX0];
            y = tu[TUF_BY0];
            w = tu[TUF_BW0];
            h = tu[TUF_BH0];
        } else {
            x = tu[TUF_BX1] * ic->ip[IP_SUB_W];
            y = tu[TUF_BY1] * ic->ip[IP_SUB_H];
            w = tu[TUF_BW1] * ic->ip[IP_SUB_W];
            h = tu[TUF_BH1] * ic->ip[IP_SUB_H];
        }
        int w4 = ic->mc->w4;
        for (int r = y >> 2; r < (y + h) >> 2; r++)
            for (int c = x >> 2; c < (x + w) >> 2; c++)
                ic->order_map[(size_t)r * w4 + c] = tu_idx;
    }
    return 0;
}

/* ---------------- MC paths ---------------- */

/* regular MC (no DMVR/BDOF): fills ic->pred */
static int ix_regular_mc(InterCtx *ic, const int32_t *cu,
                         const int32_t ent[MC_ENT], int wp_on)
{
    int num_comp = ic->ip[IP_NUM_COMP];
    int bd = ic->ip[IP_BIT_DEPTH];
    int pel_max = (1 << bd) - 1;
    int dir = ent[0];
    int bi = dir == 3 || wp_on;
    int alt = ent[8];
    int np = 0;
    int lsts[2];
    for (int lst = 0; lst < 2; lst++) {
        if (!(dir & (1 << lst)))
            continue;
        lsts[np] = lst;
        int32_t mvc[2] = {ent[1 + 2 * lst], ent[2 + 2 * lst]};
        ix_clip_mv(ic, mvc, cu[CU_X], cu[CU_Y]);
        for (int comp = 0; comp < num_comp; comp++) {
            const IxSampler *s = &ic->refs[lst][ent[5 + lst]][comp];
            int bx = comp == 0 ? cu[CU_X] : cu[CU_CX];
            int by = comp == 0 ? cu[CU_Y] : cu[CU_CY];
            int bw = comp == 0 ? cu[CU_W] : cu[CU_CW];
            int bh = comp == 0 ? cu[CU_H] : cu[CU_CH];
            if (ix_mc(ic, s, bx, by, bw, bh, mvc[0], mvc[1], comp, bi,
                      alt, ic->part[np][comp]) < 0)
                return -1;
        }
        np++;
    }
    for (int comp = 0; comp < num_comp; comp++) {
        int n = (comp == 0 ? cu[CU_W] * cu[CU_H] : cu[CU_CW] * cu[CU_CH]);
        if (wp_on) {
            int slice = cu[CU_SLICE_IDX];
            if (np == 2)
                ix_apply_wp(ic, slice, 0, ent[5], 1, ent[6],
                            ic->part[0][comp], ic->part[1][comp], n, comp,
                            ic->pred[comp]);
            else {
                int lst = lsts[0];
                ix_apply_wp(ic, slice, lst, ent[5 + lst], 0, 0,
                            ic->part[0][comp], NULL, n, comp,
                            ic->pred[comp]);
            }
        } else if (dir == 3) {
            if (ent[7] != 0)
                ix_bi_weighted(ic->part[0][comp], ic->part[1][comp], n, bd,
                               pel_max, ent[7], ic->pred[comp]);
            else
                ix_bi_average(ic->part[0][comp], ic->part[1][comp], n, bd,
                              pel_max, ic->pred[comp]);
        } else {
            memcpy(ic->pred[comp], ic->part[0][comp],
                   sizeof(int32_t) * n);
        }
    }
    return 0;
}

/* BDOF bi-prediction over 16x16 regions (recon_np._bdof_mc) */
static int ix_bdof_mc(InterCtx *ic, const int32_t *cu,
                      const int32_t ent[MC_ENT])
{
    int num_comp = ic->ip[IP_NUM_COMP];
    int bd = ic->ip[IP_BIT_DEPTH];
    int pel_max = (1 << bd) - 1;
    int sub_w = ic->ip[IP_SUB_W], sub_h = ic->ip[IP_SUB_H];
    int w = cu[CU_W], h = cu[CU_H];
    int tw = w < IX_BDOF_REGION ? w : IX_BDOF_REGION;
    int th = h < IX_BDOF_REGION ? h : IX_BDOF_REGION;
    int alt = ent[8];
    for (int ty = 0; ty < h; ty += th)
        for (int tx = 0; tx < w; tx += tw) {
            for (int lst = 0; lst < 2; lst++) {
                int32_t mvc[2] = {ent[1 + 2 * lst], ent[2 + 2 * lst]};
                ix_clip_mv(ic, mvc, cu[CU_X], cu[CU_Y]);
                const IxSampler *s = &ic->refs[lst][ent[5 + lst]][0];
                if (ix_mc_ext(ic, s, cu[CU_X] + tx, cu[CU_Y] + ty, tw, th,
                              mvc[0] >> 4, mvc[1] >> 4, mvc[0] & 15,
                              mvc[1] & 15, alt, ic->ext[lst]) < 0)
                    return -1;
                for (int comp = 1; comp < num_comp; comp++) {
                    const IxSampler *sc = &ic->refs[lst][ent[5 + lst]][comp];
                    int sx = 4 + (sub_w - 1), sy = 4 + (sub_h - 1);
                    int fx = (mvc[0] & ((1 << sx) - 1)) << (5 - sx);
                    int fy = (mvc[1] & ((1 << sy) - 1)) << (5 - sy);
                    if (ix_mc_at(ic, sc, (cu[CU_X] + tx) / sub_w,
                                 (cu[CU_Y] + ty) / sub_h, tw / sub_w,
                                 th / sub_h, mvc[0] >> sx, mvc[1] >> sy,
                                 fx, fy, comp, 1, 0,
                                 ic->part[lst][comp]) < 0)
                        return -1;
                }
            }
            ix_bdof_blend(ic, ic->ext[0], ic->ext[1], tw, th,
                          ic->pred[0] + (size_t)ty * w + tx, w);
            for (int comp = 1; comp < num_comp; comp++) {
                int cw = tw / sub_w, chh = th / sub_h;
                int stride = cu[CU_CW];
                int32_t *dst = ic->pred[comp]
                    + (size_t)(ty / sub_h) * stride + tx / sub_w;
                /* bi_average row-wise into the CU pred buffer */
                int head = 14 - bd;
                if (head < 2) head = 2;
                int shift = head + 1;
                int32_t offset = (1 << (shift - 1)) + 2 * IF_OFFS;
                for (int r = 0; r < chh; r++)
                    for (int c = 0; c < cw; c++)
                        dst[(size_t)r * stride + c] = ix_clip_pel(
                            (ic->part[0][comp][(size_t)r * cw + c]
                             + ic->part[1][comp][(size_t)r * cw + c]
                             + offset) >> shift,
                            pel_max);
            }
        }
    return 0;
}

/* DMVR (recon_np._dmvr_mc): fills ic->pred, appends MV fixups */
static int ix_dmvr_mc(InterCtx *ic, const int32_t *cu,
                      const int32_t ent[MC_ENT], int bio_applied)
{
    int num_comp = ic->ip[IP_NUM_COMP];
    int bd = ic->ip[IP_BIT_DEPTH];
    int pel_max = (1 << bd) - 1;
    int sub_w = ic->ip[IP_SUB_W], sub_h = ic->ip[IP_SUB_H];
    int w = cu[CU_W], h = cu[CU_H];
    int alt = ent[8];
    int32_t merge_mv[2][2] = {{ent[1], ent[2]}, {ent[3], ent[4]}};
    int blw = w + 2 * IX_DMVR_ITER;
    /* CU-wide bilinear buffers with 2-sample margin (xinitMC) */
    for (int lst = 0; lst < 2; lst++) {
        const IxSampler *s = &ic->refs[lst][ent[5 + lst]][0];
        int32_t mvc[2] = {merge_mv[lst][0], merge_mv[lst][1]};
        ix_clip_mv(ic, mvc, cu[CU_X], cu[CU_Y]);
        mvc[0] -= IX_DMVR_ITER << 4;
        mvc[1] -= IX_DMVR_ITER << 4;
        ix_bilinear(ic, s, cu[CU_X], cu[CU_Y], blw, h + 2 * IX_DMVR_ITER,
                    mvc[0], mvc[1], ic->bl[lst]);
    }
    int dx = w < IX_DMVR_SUBCU ? w : IX_DMVR_SUBCU;
    int dy = h < IX_DMVR_SUBCU ? h : IX_DMVR_SUBCU;
    int64_t bio_thres = 2 * dx * dy;
    static _Thread_local int32_t sub_parts[2][3][IX_DMVR_SUBCU * IX_DMVR_SUBCU];
    for (int ys = 0; ys < h; ys += dy)
        for (int xs = 0; xs < w; xs += dx) {
            int dmv[2];
            int64_t min_cost = ix_dmvr_search(ic->bl[0], ic->bl[1], blw,
                                              xs, ys, dx, dy, dmv);
            int32_t mv0[2] = {ix_clip18((int64_t)merge_mv[0][0] + dmv[0]),
                              ix_clip18((int64_t)merge_mv[0][1] + dmv[1])};
            int32_t mv1[2] = {ix_clip18((int64_t)merge_mv[1][0] - dmv[0]),
                              ix_clip18((int64_t)merge_mv[1][1] - dmv[1])};
            int bio_sub = bio_applied && min_cost >= bio_thres;
            int sx_abs = cu[CU_X] + xs, sy_abs = cu[CU_Y] + ys;
            for (int lst = 0; lst < 2; lst++) {
                const int32_t *rmv = lst == 0 ? mv0 : mv1;
                int32_t mvc[2] = {rmv[0], rmv[1]};
                ix_clip_mv(ic, mvc, sx_abs, sy_abs);
                for (int comp = 0; comp < num_comp; comp++) {
                    const IxSampler *sp = &ic->refs[lst][ent[5 + lst]][comp];
                    int shx = comp ? 4 + (sub_w - 1) : 4;
                    int shy = comp ? 4 + (sub_h - 1) : 4;
                    int bx = comp ? sx_abs / sub_w : sx_abs;
                    int by = comp ? sy_abs / sub_h : sy_abs;
                    int bw = comp ? dx / sub_w : dx;
                    int bh = comp ? dy / sub_h : dy;
                    int taps = comp ? 4 : 8;
                    int d_int_x = (rmv[0] >> shx)
                        - (merge_mv[lst][0] >> shx);
                    int d_int_y = (rmv[1] >> shy)
                        - (merge_mv[lst][1] >> shy);
                    int fx = mvc[0] & ((1 << shx) - 1);
                    int fy = mvc[1] & ((1 << shy) - 1);
                    if (comp) {
                        fx <<= 5 - shx;
                        fy <<= 5 - shy;
                    }
                    IxSampler win;
                    int int_x, int_y;
                    if (d_int_x || d_int_y) {
                        /* padded prefetch window at the merge MV
                         * (xPrefetchPad + altSrc MC) */
                        int half = taps / 2 - 1;
                        int32_t wmv[2] = {
                            merge_mv[lst][0] - (half << shx),
                            merge_mv[lst][1] - (half << shy)};
                        ix_clip_mv(ic, wmv, sx_abs, sy_abs);
                        int wx = bx + (wmv[0] >> shx);
                        int wy = by + (wmv[1] >> shy);
                        int ww = bw + taps - 1, wh = bh + taps - 1;
                        win = *sp;
                        /* composed clamp: window clamp then picture clamp */
                        win.lo_x = wx < 0 ? 0
                            : (wx > sp->W - 1 ? sp->W - 1 : wx);
                        win.hi_x = wx + ww - 1 < 0 ? 0
                            : (wx + ww - 1 > sp->W - 1 ? sp->W - 1
                                                       : wx + ww - 1);
                        win.lo_y = wy < 0 ? 0
                            : (wy > sp->H - 1 ? sp->H - 1 : wy);
                        win.hi_y = wy + wh - 1 < 0 ? 0
                            : (wy + wh - 1 > sp->H - 1 ? sp->H - 1
                                                       : wy + wh - 1);
                        int_x = (wmv[0] >> shx) + d_int_x + half;
                        int_y = (wmv[1] >> shy) + d_int_y + half;
                    } else {
                        win = *sp;
                        int_x = mvc[0] >> shx;
                        int_y = mvc[1] >> shy;
                    }
                    if (comp == 0 && bio_sub) {
                        if (ix_mc_ext(ic, &win, bx, by, bw, bh, int_x,
                                      int_y, fx, fy, alt,
                                      ic->ext[lst]) < 0)
                            return -1;
                    } else {
                        if (ix_mc_at(ic, &win, bx, by, bw, bh, int_x,
                                     int_y, fx, fy, comp, 1,
                                     comp == 0 ? alt : 0,
                                     sub_parts[lst][comp]) < 0)
                            return -1;
                    }
                }
            }
            if (bio_sub)
                ix_bdof_blend(ic, ic->ext[0], ic->ext[1], dx, dy,
                              ic->pred[0] + (size_t)ys * w + xs, w);
            else {
                int head = 14 - bd;
                if (head < 2) head = 2;
                int shift = head + 1;
                int32_t offset = (1 << (shift - 1)) + 2 * IF_OFFS;
                for (int r = 0; r < dy; r++)
                    for (int c = 0; c < dx; c++)
                        ic->pred[0][(size_t)(ys + r) * w + xs + c] =
                            ix_clip_pel(
                                (sub_parts[0][0][(size_t)r * dx + c]
                                 + sub_parts[1][0][(size_t)r * dx + c]
                                 + offset) >> shift,
                                pel_max);
            }
            for (int comp = 1; comp < num_comp; comp++) {
                int cw = dx / sub_w, chh = dy / sub_h;
                int stride = cu[CU_CW];
                int32_t *dst = ic->pred[comp]
                    + (size_t)(ys / sub_h) * stride + xs / sub_w;
                int head = 14 - bd;
                if (head < 2) head = 2;
                int shift = head + 1;
                int32_t offset = (1 << (shift - 1)) + 2 * IF_OFFS;
                for (int r = 0; r < chh; r++)
                    for (int c = 0; c < cw; c++)
                        dst[(size_t)r * stride + c] = ix_clip_pel(
                            (sub_parts[0][comp][(size_t)r * cw + c]
                             + sub_parts[1][comp][(size_t)r * cw + c]
                             + offset) >> shift,
                            pel_max);
            }
            /* refined-MV writeback positions (TaskFinishMotionInfo) */
            for (int y2 = ((sy_abs - 1) & ~7) + 8; y2 < sy_abs + dy;
                 y2 += 8)
                for (int x2 = ((sx_abs - 1) & ~7) + 8; x2 < sx_abs + dx;
                     x2 += 8) {
                    int fn = ic->state[IST_FIX_N];
                    if (fn >= ic->fix_cap)
                        return -1;
                    int32_t *f = ic->fix + (size_t)fn * 6;
                    f[0] = x2;
                    f[1] = y2;
                    f[2] = mv0[0];
                    f[3] = mv0[1];
                    f[4] = mv1[0];
                    f[5] = mv1[1];
                    ic->state[IST_FIX_N] = fn + 1;
                }
        }
    return 0;
}

/* ---------------- conditions ---------------- */

static int ix_eq_dist(const InterCtx *ic, const int32_t ent[MC_ENT])
{
    if (ent[5] < 0 || ent[6] < 0)
        return 0;
    const MotionCtx *mc = ic->mc;
    int poc0 = mc->ref_pocs[ent[5]];
    int poc1 = mc->ref_pocs[MC_MAX_REF + ent[6]];
    return (mc->poc - poc0) == (poc1 - mc->poc);
}

static int ix_wp_present(const InterCtx *ic, int slice,
                         const int32_t ent[MC_ENT])
{
    const uint8_t *wp = ic->wp_pres + (size_t)slice * 2 * 16;
    int a = ent[5] >= 0 ? wp[ent[5]] : 0;
    int b = ent[6] >= 0 ? wp[16 + ent[6]] : 0;
    return a || b;
}

/* ---------------- per-CU driver ---------------- */

/* pre-check a CU's TUs: residual path representable (dims >= 2, matrices
 * available) */
static int ix_cu_tus_ok(const InterCtx *ic, const int32_t *cu)
{
    for (int t = cu[CU_FIRST_TU]; t < cu[CU_FIRST_TU] + cu[CU_NUM_TU];
         t++) {
        const int32_t *tu = ic->tu_rec + (size_t)t * TUF_NF;
        for (int comp = 0; comp < 3; comp++) {
            int w = tu[TUF_BW0 + comp * 4], h = tu[TUF_BH0 + comp * 4];
            if (!w)
                continue;
            int coded = comp == 0
                ? tu[TUF_CBF0]
                : (tu[TUF_CBF0 + comp] || tu[TUF_JOINT_CBCR]);
            if (!coded)
                continue;
            if (w < 2 || h < 2 || w > 64 || h > 64)
                return 0;
            if (tu[TUF_MTS0 + comp] == 1)
                continue; /* transform skip */
            int kh, kv;
            ix_tr_types(ic, cu, tu, comp, &kh, &kv);
            if (ix_tr_matrix(ic, kh, w) == NULL
                || ix_tr_matrix(ic, kv, h) == NULL)
                return 0;
        }
    }
    return 1;
}

static int ix_cu_eligible(const InterCtx *ic, const int32_t *cu)
{
    if (cu[CU_PRED_MODE] != W_MODE_INTER)
        return 0;
    if (cu[CU_AFFINE] || cu[CU_GEO] || cu[CU_CIIP])
        return 0;
    if (cu[CU_W] > IX_MAX_CU || cu[CU_H] > IX_MAX_CU)
        return 0;
    /* references in range */
    if (cu[CU_MERGE_FLAG] == 0) {
        for (int lst = 0; lst < 2; lst++) {
            if (!(cu[CU_INTER_DIR] & (1 << lst)))
                continue;
            int r = cu[CU_REF0 + lst];
            if (r < 0 || r >= ic->nref[lst])
                return 0;
        }
    }
    return ix_cu_tus_ok(ic, cu);
}

/* full CU: derivation + MC + residual.  Returns 0 ok, -1 error. */
static int ix_run_cu(InterCtx *ic, int cu_idx)
{
    MotionCtx *mc = ic->mc;
    const int32_t *cu = MC_CU(mc, cu_idx);
    int32_t ent[MC_ENT];
    /* HMVP reset per CTU row / tile (DecCu.cpp:70-74) */
    int row = cu[CU_Y] >> mc->ctu_log2;
    int tile = cu[CU_TILE_IDX];
    if (row != ic->state[IST_ROW] || tile != ic->state[IST_TILE]) {
        ic->hist_n[0] = 0;
        ic->state[IST_ROW] = row;
        ic->state[IST_TILE] = tile;
    }
    int imv;
    if (cu[CU_MERGE_FLAG]) {
        static _Thread_local int32_t cands[IX_MAX_MERGE * MC_ENT];
        int nc = mc_merge_core(mc, cu_idx, cands);
        if (cu[CU_MMVD_FLAG])
            ix_derive_mmvd(ic, cu, cands, nc, ent);
        else {
            int mi = cu[CU_MERGE_IDX];
            if (mi >= nc)
                return -1;
            memcpy(ent, cands + (size_t)mi * MC_ENT,
                   MC_ENT * sizeof(int32_t));
        }
        imv = ent[8] ? 3 : 0;
        if (cu[CU_W] + cu[CU_H] == 12 && ent[0] == 3) {
            /* 4x8/8x4 merge drops to L0 uni-prediction */
            ent[0] = 1;
            ent[6] = -1;
            ent[3] = 0;
            ent[4] = 0;
            ent[7] = 0;
        }
        if (ent[5] >= ic->nref[0] || ent[6] >= ic->nref[1])
            return -1;
    } else {
        imv = cu[CU_IMV];
        int sh_amvr = MC_AMVR_SHIFT[imv & 3];
        ent[0] = cu[CU_INTER_DIR];
        ent[1] = ent[2] = ent[3] = ent[4] = 0;
        ent[5] = ent[6] = -1;
        ent[7] = cu[CU_BCW];
        ent[8] = imv == 3;
        for (int lst = 0; lst < 2; lst++) {
            if (!(cu[CU_INTER_DIR] & (1 << lst)))
                continue;
            int ref = cu[CU_REF0 + lst];
            int32_t amvp[4];
            mc_amvp_core(mc, cu_idx, lst, ref, amvp);
            const int32_t *base = amvp + 2 * (cu[CU_MVP0 + lst] & 1);
            int64_t mx = (int64_t)base[0]
                + ((int64_t)cu[CU_MVD0X + 2 * lst] << sh_amvr);
            int64_t my = (int64_t)base[1]
                + ((int64_t)cu[CU_MVD0Y + 2 * lst] << sh_amvr);
            const int64_t c17 = (int64_t)1 << 17;
            mx = ((mx + c17) & (2 * c17 - 1)) - c17;
            my = ((my + c17) & (2 * c17 - 1)) - c17;
            ent[1 + 2 * lst] = (int32_t)mx;
            ent[2 + 2 * lst] = (int32_t)my;
            ent[5 + lst] = ref;
        }
    }
    /* derived bcw/imv feed later neighbors (side table) */
    ic->side[(size_t)cu_idx * 2] = ent[7];
    ic->side[(size_t)cu_idx * 2 + 1] = imv;

    const int32_t *slt = mc->slice_tab
        + (size_t)cu[CU_SLICE_IDX] * SLT_NF;
    const int32_t *sx = ic->slice_ex + (size_t)cu[CU_SLICE_IDX] * IS_NF;
    int is_b = slt[SLT_IS_B];
    int wp_present = ix_wp_present(ic, cu[CU_SLICE_IDX], ent);
    int big = cu[CU_H] >= 8 && cu[CU_W] >= 8
        && cu[CU_W] * cu[CU_H] >= 128;
    int eqd = ix_eq_dist(ic, ent);
    /* BDOF applicability (dmvr_np.bdof_condition; affine/ciip/sbtmvp
     * excluded by eligibility) */
    int cs_bio = ic->ip[IP_BDOF_EN] && !cu[CU_SMVD]
        && !(ic->ip[IP_BCW_EN] && ent[7] != 0)
        && !(wp_present && is_b) && !sx[IS_WP_P_GATE] && eqd && big;
    /* DMVR applicability (dmvr_np.dmvr_condition) */
    int cs_dmvr = ic->ip[IP_DMVR_EN] && cu[CU_MERGE_FLAG]
        && !cu[CU_MMVD_FLAG] && eqd && big && ent[7] == 0 && !wp_present;
    int rc;
    if (cs_dmvr)
        rc = ix_dmvr_mc(ic, cu, ent, cs_bio);
    else if (cs_bio)
        rc = ix_bdof_mc(ic, cu, ent);
    else {
        int wp_on = ent[0] == 3 ? (sx[IS_WP_B_GATE] && ent[7] == 0)
                                : (sx[IS_WP_P_GATE] || sx[IS_WP_B_GATE]);
        rc = ix_regular_mc(ic, cu, ent, wp_on);
    }
    if (rc < 0)
        return -1;
    ix_span_motion(ic, cu, ent);
    ix_hist_add(ic, ent);
    /* residual reconstruction for all TUs of this CU */
    for (int t = cu[CU_FIRST_TU]; t < cu[CU_FIRST_TU] + cu[CU_NUM_TU]; t++)
        if (ix_recon_tu(ic, cu, t) < 0)
            return -1;
    return 0;
}

/* run_from(start_tu[, n_tus]) -> first unhandled TU index.
 * n_tus bounds the walk at the picture's real record count; the buffer
 * capacity (records beyond the count are uninitialized) is only a cap. */
static PyObject *InterCtx_run_from(InterCtx *self, PyObject *args)
{
    int start, limit = self->n_tus;
    if (!PyArg_ParseTuple(args, "i|i", &start, &limit))
        return NULL;
    if (limit > self->n_tus)
        limit = self->n_tus;
    int i = start;
    g_walk_err = NULL;
    Py_BEGIN_ALLOW_THREADS
    while (i < limit) {
        const int32_t *tu = self->tu_rec + (size_t)i * TUF_NF;
        int cu_idx = tu[TUF_CU_IDX];
        const int32_t *cu = MC_CU(self->mc, cu_idx);
        if (i != cu[CU_FIRST_TU])
            break;
        if (!ix_cu_eligible(self, cu))
            break;
        if (ix_run_cu(self, cu_idx) < 0)
            break;
        i = cu[CU_FIRST_TU] + cu[CU_NUM_TU];
    }
    Py_END_ALLOW_THREADS
    if (g_walk_err) {
        PyErr_SetString(PyExc_ValueError, g_walk_err);
        return NULL;
    }
    return PyLong_FromLong(i);
}

/* ---------------- lifecycle ---------------- */

static void InterCtx_dealloc(InterCtx *self)
{
    Py_XDECREF(self->mc_obj);
    PyBuffer_Release(&self->b_tu_rec);
    PyBuffer_Release(&self->b_params);
    PyBuffer_Release(&self->b_slice_ex);
    PyBuffer_Release(&self->b_wp_prm);
    PyBuffer_Release(&self->b_wp_pres);
    PyBuffer_Release(&self->b_order);
    PyBuffer_Release(&self->b_fix);
    PyBuffer_Release(&self->b_state);
    PyBuffer_Release(&self->b_bank);
    PyBuffer_Release(&self->b_troff);
    PyBuffer_Release(&self->b_if_luma);
    PyBuffer_Release(&self->b_if_chroma);
    PyBuffer_Release(&self->b_if_bilin);
    PyBuffer_Release(&self->b_if_alt);
    for (int c = 0; c < 3; c++) {
        PyBuffer_Release(&self->b_reco[c]);
        PyBuffer_Release(&self->b_coef[c]);
    }
    for (int i = 0; i < self->n_ref_bufs; i++)
        PyBuffer_Release(&self->ref_bufs[i]);
    free(self->ref_bufs);
    free(self->pred[0]);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static int InterCtx_init(InterCtx *self, PyObject *args, PyObject *kw)
{
    (void)kw;
    PyObject *mc_obj, *refs_list, *ref_map_obj;
    Py_buffer b_mi_ref_mut, b_mi_mv_mut, b_hist_mut, b_hist_n_mut,
        b_side_mut;
    memset(((char *)self) + sizeof(PyObject), 0,
           sizeof(InterCtx) - sizeof(PyObject));
    /* NOTE: no buffer units inside nested tuples — CPython's getargs
     * sizes its cleanup freelist by the TOP-LEVEL argument count, so
     * nested buffer conversions overflow it (heap corruption). */
    if (!PyArg_ParseTuple(
            args, "Oy*w*w*y*y*w*w*w*y*y*y*(iiiiii)w*y*y*y*y*"
                  "y*y*y*y*OOw*w*w*w*w*",
            &mc_obj, &self->b_tu_rec, &self->b_fix, &self->b_state,
            &self->b_params, &self->b_slice_ex, &self->b_reco[0],
            &self->b_reco[1], &self->b_reco[2], &self->b_coef[0],
            &self->b_coef[1], &self->b_coef[2], &self->pw[0], &self->ph[0],
            &self->pw[1], &self->ph[1], &self->pw[2], &self->ph[2],
            &self->b_order, &self->b_wp_prm, &self->b_wp_pres,
            &self->b_bank, &self->b_troff, &self->b_if_luma,
            &self->b_if_chroma, &self->b_if_bilin, &self->b_if_alt,
            &refs_list, &ref_map_obj, &b_mi_ref_mut, &b_mi_mv_mut,
            &b_hist_mut, &b_hist_n_mut, &b_side_mut))
        return -1;
    if (!PyObject_TypeCheck(mc_obj, &MotionCtxType)) {
        PyErr_SetString(PyExc_TypeError, "expected MotionCtx");
        return -1;
    }
    Py_INCREF(mc_obj);
    self->mc_obj = mc_obj;
    self->mc = (MotionCtx *)mc_obj;
    self->tu_rec = (const int32_t *)self->b_tu_rec.buf;
    self->n_tus = (int)(self->b_tu_rec.len / (TUF_NF * sizeof(int32_t)));
    self->fix = (int32_t *)self->b_fix.buf;
    self->fix_cap = (int)(self->b_fix.len / (6 * sizeof(int32_t)));
    self->state = (int32_t *)self->b_state.buf;
    self->ip = (const int32_t *)self->b_params.buf;
    self->slice_ex = (const int32_t *)self->b_slice_ex.buf;
    for (int c = 0; c < 3; c++) {
        self->reco[c] = (int32_t *)self->b_reco[c].buf;
        self->coef[c] = (const int32_t *)self->b_coef[c].buf;
    }
    self->order_map = (int32_t *)self->b_order.buf;
    self->wp_prm = (const int32_t *)self->b_wp_prm.buf;
    self->wp_pres = (const uint8_t *)self->b_wp_pres.buf;
    self->bank = (const int32_t *)self->b_bank.buf;
    self->troff = (const int32_t *)self->b_troff.buf;
    self->if_luma = (const int32_t *)self->b_if_luma.buf;
    self->if_chroma = (const int32_t *)self->b_if_chroma.buf;
    self->if_bilin = (const int32_t *)self->b_if_bilin.buf;
    self->if_alt = (const int32_t *)self->b_if_alt.buf;
    /* mutable aliases into the MotionCtx-shared numpy buffers; the
     * writable views were passed explicitly to prove writability */
    self->mi_ref = (int8_t *)b_mi_ref_mut.buf;
    self->mi_mv = (int32_t *)b_mi_mv_mut.buf;
    self->hist = (int32_t *)b_hist_mut.buf;
    self->hist_n = (int32_t *)b_hist_n_mut.buf;
    self->side = (int32_t *)b_side_mut.buf;
    PyBuffer_Release(&b_mi_ref_mut);
    PyBuffer_Release(&b_mi_mv_mut);
    PyBuffer_Release(&b_hist_mut);
    PyBuffer_Release(&b_hist_n_mut);
    PyBuffer_Release(&b_side_mut);

    /* reference planes: refs_list = [(p0, p1, p2), ...] distinct plane
     * triples; ref_map int32 [2][MC_MAX_REF] indexes into it (-1 unused) */
    if (!PyList_Check(refs_list)) {
        PyErr_SetString(PyExc_TypeError, "refs must be a list");
        return -1;
    }
    int n_triples = (int)PyList_GET_SIZE(refs_list);
    self->ref_bufs = calloc(n_triples ? n_triples * 3 : 1,
                            sizeof(Py_buffer));
    for (int i = 0; i < n_triples; i++) {
        PyObject *t = PyList_GET_ITEM(refs_list, i);
        for (int c = 0; c < 3; c++) {
            PyObject *pl = PyTuple_GET_ITEM(t, c);
            if (PyObject_GetBuffer(pl, &self->ref_bufs[i * 3 + c],
                                   PyBUF_SIMPLE) < 0)
                return -1;
            self->n_ref_bufs++;
        }
    }
    Py_buffer map_buf;
    if (PyObject_GetBuffer(ref_map_obj, &map_buf, PyBUF_SIMPLE) < 0)
        return -1;
    const int32_t *ref_map = (const int32_t *)map_buf.buf;
    for (int lst = 0; lst < 2; lst++) {
        self->nref[lst] = 0;
        for (int r = 0; r < MC_MAX_REF; r++) {
            int tri = ref_map[lst * MC_MAX_REF + r];
            if (tri < 0)
                continue;
            self->nref[lst] = r + 1;
            for (int c = 0; c < 3; c++) {
                IxSampler *s = &self->refs[lst][r][c];
                s->p = (const int32_t *)self->ref_bufs[tri * 3 + c].buf;
                s->W = self->pw[c];
                s->H = self->ph[c];
                s->lo_x = 0;
                s->lo_y = 0;
                s->hi_x = s->W - 1;
                s->hi_y = s->H - 1;
            }
        }
    }
    PyBuffer_Release(&map_buf);

    /* scratch (one block) */
    size_t cu_sz = (size_t)IX_MAX_CU * IX_MAX_CU;
    size_t bl_sz = (size_t)(IX_MAX_CU + 2 * IX_DMVR_ITER + 1)
        * (IX_MAX_CU + 2 * IX_DMVR_ITER + 1);
    size_t ext_sz = (size_t)(IX_BDOF_REGION + 2) * (IX_BDOF_REGION + 2);
    size_t total = cu_sz * 3          /* pred */
        + cu_sz * 6                   /* part */
        + bl_sz * 2                   /* bl */
        + ext_sz * 6;                 /* ext + gx + gy */
    int32_t *mem = malloc(total * sizeof(int32_t)
                          + 2 * 64 * 64 * sizeof(int64_t));
    if (!mem) {
        PyErr_NoMemory();
        return -1;
    }
    int32_t *p = mem;
    for (int c = 0; c < 3; c++) {
        self->pred[c] = p;
        p += cu_sz;
    }
    for (int l = 0; l < 2; l++)
        for (int c = 0; c < 3; c++) {
            self->part[l][c] = p;
            p += cu_sz;
        }
    for (int l = 0; l < 2; l++) {
        self->bl[l] = p;
        p += bl_sz;
    }
    for (int l = 0; l < 2; l++) {
        self->ext[l] = p;
        p += ext_sz;
        self->gx[l] = p;
        p += ext_sz;
        self->gy[l] = p;
        p += ext_sz;
    }
    self->resi = (int64_t *)p;
    self->jccr = self->resi + 64 * 64;
    return 0;
}

static PyMethodDef InterCtx_methods[] = {
    {"run_from", (PyCFunction)InterCtx_run_from, METH_VARARGS,
     "process eligible inter CUs' TUs from index; returns stop index"},
    {NULL},
};

static PyTypeObject InterCtxType = {
    PyVarObject_HEAD_INIT(NULL, 0).tp_name = "_cabac.InterCtx",
    .tp_basicsize = sizeof(InterCtx),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)InterCtx_init,
    .tp_dealloc = (destructor)InterCtx_dealloc,
    .tp_methods = InterCtx_methods,
};
