/* Native host recon engine: per-TU intra prediction + dequant + inverse
 * transform + reconstruction for the common-tool fast path.
 *
 * Bit-exact port of the numpy golden (vvdec_tpu/frame/recon_np.py), which is
 * itself validated against the reference decoder (vvdec IntraPrediction.cpp /
 * Quant.cpp / TrQuant_EMT.cpp).  This is the host-plane scalar engine, the
 * same role the reference's CommonLib scalar kernels play under its SIMD
 * dispatch; TUs using tools outside the fast set fall back to the Python
 * path per TU (the caller preserves parse order).
 *
 * Fast set: intra planar / DC / angular (incl. wide-angle, PDPC, reference
 * smoothing, 4-tap cubic/gauss luma interpolation, 2-tap chroma), MIP,
 * CCLM, DCT2 / DST7 / DCT8 separable inverse transforms with
 * coefficient-region bounds, LFNST, transform-skip, flat dequant with
 * dependent-quant scaling.  Excluded (Python fallback): ISP, MRL, BDPCM,
 * joint-CbCr, scaling lists, LMCS, ACT, IBC, inter.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

#define MAX_TR_RANGE 15
#define TR_CLIP_MIN (-(1 << MAX_TR_RANGE))
#define TR_CLIP_MAX ((1 << MAX_TR_RANGE) - 1)

/* g_InvQuantScales (Rom.cpp): [needs_sqrt2][qp_rem] */
static const int INV_QUANT_SCALES[2][6] = {
    {40, 45, 51, 57, 64, 72},
    {57, 64, 72, 80, 90, 102},
};

/* intra angular parameters (H.266 Table 30/31; Rom.cpp g_angTable) */
static const int ANG_TABLE[32] = {
    0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32, 35,
    39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512, 1024};
static const int INV_ANG_TABLE[32] = {
    0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170, 1024, 910,
    819, 712, 630, 565, 512, 468, 420, 364, 321, 287, 256, 224, 191, 161,
    128, 96, 64, 48, 32, 16};

static const int INTRA_FILTER_THRESH[8] = {24, 24, 24, 14, 2, 0, 0, 0};

/* 4-tap intra interpolation filters, 32 phases */
static const int CHROMA_FILTER[32][4] = {
    {0, 64, 0, 0},   {-1, 63, 2, 0},  {-2, 62, 4, 0},  {-2, 60, 7, -1},
    {-2, 58, 10, -2}, {-3, 57, 12, -2}, {-4, 56, 14, -2}, {-4, 55, 15, -2},
    {-4, 54, 16, -2}, {-5, 53, 18, -2}, {-6, 52, 20, -2}, {-6, 49, 24, -3},
    {-6, 46, 28, -4}, {-5, 44, 29, -4}, {-4, 42, 30, -4}, {-4, 39, 33, -4},
    {-4, 36, 36, -4}, {-4, 33, 39, -4}, {-4, 30, 42, -4}, {-4, 29, 44, -5},
    {-4, 28, 46, -6}, {-3, 24, 49, -6}, {-2, 20, 52, -6}, {-2, 18, 53, -5},
    {-2, 16, 54, -4}, {-2, 15, 55, -4}, {-2, 14, 56, -4}, {-2, 12, 57, -3},
    {-2, 10, 58, -2}, {-1, 7, 60, -2}, {0, 4, 62, -2},  {0, 2, 63, -1}};
static const int GAUSS_FILTER[32][4] = {
    {16, 32, 16, 0}, {16, 32, 16, 0}, {15, 31, 17, 1}, {15, 31, 17, 1},
    {14, 30, 18, 2}, {14, 30, 18, 2}, {13, 29, 19, 3}, {13, 29, 19, 3},
    {12, 28, 20, 4}, {12, 28, 20, 4}, {11, 27, 21, 5}, {11, 27, 21, 5},
    {10, 26, 22, 6}, {10, 26, 22, 6}, {9, 25, 23, 7},  {9, 25, 23, 7},
    {8, 24, 24, 8},  {8, 24, 24, 8},  {7, 23, 25, 9},  {7, 23, 25, 9},
    {6, 22, 26, 10}, {6, 22, 26, 10}, {5, 21, 27, 11}, {5, 21, 27, 11},
    {4, 20, 28, 12}, {4, 20, 28, 12}, {3, 19, 29, 13}, {3, 19, 29, 13},
    {2, 18, 30, 14}, {2, 18, 30, 14}, {1, 17, 31, 15}, {1, 17, 31, 15}};

#define PLANAR_IDX 0
#define DC_IDX 1
#define HOR_IDX 18
#define DIA_IDX 34
#define VER_IDX 50
#define VDIA_IDX 66

/* TU descriptor layout (int32).  [0]=flags, [1]=cu_idx,
 * [2..5]=order-map rect (luma coords x,y,w,h), then 3 components x 16:
 * x, y, w, h, cbf, mode, filt, qp, max_scan_x, max_scan_y, mat_h, mat_v,
 * special (0 none, 1 transform-skip, 2 MIP, 3 CCLM),
 * lfnst bank offset (-1 none),
 * lfnst meta (bit0 transpose, bit1 sb8, bit2 zero16),
 * mip meta (bit0 transpose, bits1-2 size id) */
#define TD_STRIDE 54
#define TD_COMP_BASE 6
#define TD_COMP_STRIDE 16
#define F_ELIG 1
#define F_COMP0 2
#define F_CHROMA 4
#define F_DEPQ 8
#define SP_NONE 0
#define SP_MIP 2
#define SP_CCLM 3
/* cd[12] low nibble = prediction kind; bit4 = transform-skip residual */

/* cu_meta stride 6: x, y, cx, cy, slice_idx, tile_idx */
#define CM_STRIDE 6

typedef struct {
    int32_t *reco[3];
    const int32_t *coef[3];
    int W[3], H[3];
    const int32_t *cu_map, *cu_map_c;
    int32_t *order_map;
    int om_w;  /* cu_map / order_map width = luma W>>2 */
    int cmc_w; /* cu_map_c width = chroma W>>1 */
    const int32_t *cu_meta;
    const int32_t *bank;     /* transform matrix bank */
    const int32_t *bank_off; /* offset of matrix id i */
    const int32_t *lfnst;    /* LFNST kernel bank (4x4 then 8x8 sets) */
    const int32_t *mip[3];   /* MIP weights per size id */
    int bit_depth, pel_max, wpp, ctu_log2, sub_w, sub_h, num_comp;
    int fmt, collocated, imi; /* chroma fmt, ver-collocated, bd-shift */
} Ctx;

/* first 16 coefficients of the 4x4-CG diagonal scan, (y, x) pairs
 * (rom.scan_grouped(w, h)[:16] for every w, h >= 4) */
static const int8_t SCAN16[16][2] = {
    {0, 0}, {1, 0}, {0, 1}, {2, 0}, {1, 1}, {0, 2}, {3, 0}, {2, 1},
    {1, 2}, {0, 3}, {3, 1}, {2, 2}, {1, 3}, {3, 2}, {2, 3}, {3, 3}};

static inline int ilog2(int v) { /* v is a power of two >= 1 */
    int r = 0;
    while (v > 1) { v >>= 1; r++; }
    return r;
}
static inline int bitlen(int v) { /* Python int.bit_length for v >= 0 */
    int r = 0;
    while (v) { v >>= 1; r++; }
    return r;
}
static inline int iclip(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int64_t lclip(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

/* availability of reference sample (px,py) in comp coords
 * (recon_np.IntraReconstructor._avail; CodingStructure::getCURestricted) */
static int avail(const Ctx *c, int px, int py, int comp, int cu_idx,
                 int tu_order) {
    if (px < 0 || py < 0)
        return 0;
    int sx = comp ? c->sub_w : 1, sy = comp ? c->sub_h : 1;
    int pi = comp ? 1 : 0;
    if (px >= c->W[pi] || py >= c->H[pi])
        return 0;
    const int32_t *cm = c->cu_meta + (size_t)cu_idx * CM_STRIDE;
    int shx = c->ctu_log2 - (sx - 1);
    int shy = c->ctu_log2 - (sy - 1);
    int cux = comp ? cm[2] : cm[0];
    int cuy = comp ? cm[3] : cm[1];
    int xdiff = (px >> shx) - (cux >> shx);
    int ydiff = (py >> shy) - (cuy >> shy);
    if (ydiff > 0 || (ydiff == 0 && xdiff > 0))
        return 0;
    if (xdiff > (c->wpp ? 0 : 1))
        return 0;
    int lx = px * sx, ly = py * sy;
    int idx2;
    if (comp)
        idx2 = c->cu_map_c[(size_t)(py >> 1) * c->cmc_w + (px >> 1)];
    else
        idx2 = c->cu_map[(size_t)(py >> 2) * c->om_w + (px >> 2)];
    if (idx2 < 0)
        return 0;
    const int32_t *cm2 = c->cu_meta + (size_t)idx2 * CM_STRIDE;
    if (cm2[4] != cm[4] || cm2[5] != cm[5])
        return 0;
    if (idx2 > cu_idx)
        return 0;
    if (idx2 == cu_idx) {
        int order = c->order_map[(size_t)(ly >> 2) * c->om_w + (lx >> 2)];
        if (order < 0 || order >= tu_order)
            return 0;
    }
    return 1;
}

/* reference sample fill, mrl = 0 (recon_np.fill_reference;
 * xFillReferenceSamples IntraPrediction.cpp:1069).
 * top has 2w+1 entries, left 2h+1; index 0 is the corner. */
static void fill_reference(const Ctx *c, int comp, int cu_idx, int tu_order,
                           int x, int y, int w, int h, int32_t *top,
                           int32_t *left) {
    int pi = comp ? 1 : 0;
    const int32_t *reco = c->reco[pi == 0 ? 0 : comp];
    int W = c->W[pi], H = c->H[pi];
    int pred_size = 2 * w, pred_h = 2 * h;
    int sx = comp ? c->sub_w : 1, sy = comp ? c->sub_h : 1;
    int unit_w = 4 / sx, unit_h = 4 / sy;
    int top_len = pred_size + 1, left_len = pred_h + 1;

    int total_above_units = (pred_size + unit_w - 1) / unit_w;
    int total_left_units = (pred_h + unit_h - 1) / unit_h;
    int total_units = total_above_units + total_left_units + 1;

    int n_topleft = avail(c, x - 1, y - 1, comp, cu_idx, tu_order) ? 1 : 0;
    int n_above = 0, n_left = 0, u;
    for (u = 0; u < total_above_units; u++) {
        if (avail(c, x + u * unit_w, y - 1, comp, cu_idx, tu_order))
            n_above++;
        else
            break;
    }
    for (u = 0; u < total_left_units; u++) {
        if (avail(c, x - 1, y + u * unit_h, comp, cu_idx, tu_order))
            n_left++;
        else
            break;
    }
    int num_avail = n_topleft + n_above + n_left;
    int dc_val = 1 << (c->bit_depth - 1);
    int i, n;

    if (num_avail == 0) {
        for (i = 0; i < top_len; i++) top[i] = dc_val;
        for (i = 0; i < left_len; i++) left[i] = dc_val;
        return;
    }
    if (num_avail == total_units) {
        n = pred_size + 1;
        if (n > W - (x - 1)) n = W - (x - 1);
        for (i = 0; i < n; i++)
            top[i] = reco[(size_t)(y - 1) * W + (x - 1) + i];
        for (; i < top_len; i++) top[i] = top[n - 1];
        n = pred_h;
        if (n > H - y) n = H - y;
        left[0] = top[0];
        for (i = 0; i < n; i++)
            left[1 + i] = reco[(size_t)(y + i) * W + (x - 1)];
        for (i = 1 + n; i < left_len; i++) left[i] = left[n];
        return;
    }
    /* partial availability (xFillReferenceSamples :1161) */
    if (n_left > 0) {
        n = n_left * unit_h;
        if (n > pred_h) n = pred_h;
        if (n > H - y) n = H - y;
        for (i = 0; i < n; i++)
            left[1 + i] = reco[(size_t)(y + i) * W + (x - 1)];
        for (i = 1 + n; i < left_len; i++) left[i] = left[n];
        if (n_topleft) {
            top[0] = reco[(size_t)(y - 1) * W + (x - 1)];
            left[0] = top[0];
        } else {
            int corner = reco[(size_t)y * W + (x - 1)];
            top[0] = corner;
            left[0] = corner;
        }
        if (n_above > 0) {
            n = n_above * unit_w;
            if (n > pred_size) n = pred_size;
            if (n > W - x) n = W - x;
            for (i = 0; i < n; i++)
                top[1 + i] = reco[(size_t)(y - 1) * W + x + i];
            for (i = 1 + n; i < top_len; i++) top[i] = top[n];
        } else {
            for (i = 1; i < top_len; i++) top[i] = top[0];
        }
    } else {
        /* left unavailable -> top must be available */
        n = n_above * unit_w;
        if (n > pred_size) n = pred_size;
        if (n > W - x) n = W - x;
        for (i = 0; i < n; i++)
            top[1 + i] = reco[(size_t)(y - 1) * W + x + i];
        for (i = 1 + n; i < top_len; i++) top[i] = top[n];
        int corner = reco[(size_t)(y - 1) * W + x];
        top[0] = corner;
        for (i = 0; i < left_len; i++) left[i] = corner;
    }
}

/* [1 2 1] reference smoothing (xFilterReferenceSamples) */
static void filter_reference(const int32_t *top, const int32_t *left,
                             int top_len, int left_len, int32_t *ftop,
                             int32_t *fleft) {
    int i;
    memcpy(ftop, top, sizeof(int32_t) * top_len);
    memcpy(fleft, left, sizeof(int32_t) * left_len);
    for (i = 1; i < left_len - 1; i++)
        fleft[i] = (left[i - 1] + 2 * left[i] + left[i + 1] + 2) >> 2;
    int cnr = (left[1] + 2 * top[0] + top[1] + 2) >> 2;
    ftop[0] = cnr;
    fleft[0] = cnr;
    for (i = 1; i < top_len - 1; i++)
        ftop[i] = (top[i - 1] + 2 * top[i] + top[i + 1] + 2) >> 2;
}

static int wide_angle(int width, int height, int mode) {
    static const int mode_shift[6] = {0, 6, 10, 12, 14, 15};
    if (mode > DC_IDX && mode <= VDIA_IDX) {
        int delta = ilog2(width) - ilog2(height);
        if (delta < 0) delta = -delta;
        if (width > height && mode < 2 + mode_shift[delta])
            mode += VDIA_IDX - 1;
        else if (height > width && mode > VDIA_IDX - mode_shift[delta])
            mode -= VDIA_IDX - 1;
    }
    return mode;
}

/* planar prediction into pred[h][w] (xPredIntraPlanarCore) */
static void pred_planar(const int32_t *top, const int32_t *left, int w, int h,
                        int32_t *pred) {
    int log2w = ilog2(w), log2h = ilog2(h);
    int32_t bottom_left = left[1 + h];
    int32_t top_right = top[1 + w];
    int32_t offset = 1 << (log2w + log2h);
    for (int yy = 0; yy < h; yy++) {
        int32_t lv = left[1 + yy];
        for (int xx = 0; xx < w; xx++) {
            int32_t tv = top[1 + xx];
            int32_t hor = (lv << log2w) + (xx + 1) * (top_right - lv);
            int32_t ver = (tv << log2h) + (yy + 1) * (bottom_left - tv);
            pred[(size_t)yy * w + xx] =
                ((hor << log2h) + (ver << log2w) + offset) >>
                (1 + log2w + log2h);
        }
    }
}

static void pred_dc(const int32_t *top, const int32_t *left, int w, int h,
                    int32_t *pred) {
    int32_t s = 0;
    int denom = (w == h) ? (w << 1) : (w > h ? w : h);
    int i;
    if (w >= h)
        for (i = 0; i < w; i++) s += top[1 + i];
    if (w <= h)
        for (i = 0; i < h; i++) s += left[1 + i];
    int32_t dc = (s + (denom >> 1)) >> (bitlen(denom) - 1);
    for (i = 0; i < w * h; i++) pred[i] = dc;
}

/* PDPC for DC/planar (IntraPredSampleFilterCore) */
static void pdpc_dc_planar(int32_t *pred, const int32_t *top,
                           const int32_t *left, int w, int h) {
    int scale = ((ilog2(w) - 2) + (ilog2(h) - 2) + 2) >> 2;
    for (int yy = 0; yy < h; yy++) {
        int sh = (yy << 1) >> scale;
        int wt = sh > 31 ? 0 : (32 >> sh);
        int32_t lv_t = 0; /* per-row top weight applies to top[x] */
        (void)lv_t;
        for (int xx = 0; xx < w; xx++) {
            int shl = (xx << 1) >> scale;
            int wl = shl > 31 ? 0 : (32 >> shl);
            int32_t v = pred[(size_t)yy * w + xx];
            int32_t lv = left[1 + yy], tv = top[1 + xx];
            pred[(size_t)yy * w + xx] =
                v + ((wl * (lv - v) + wt * (tv - v) + 32) >> 6);
        }
    }
}

/* angular prediction incl. wide-angle + PDPC, mrl = 0
 * (recon_np.pred_angular; xPredIntraAng IntraPrediction.cpp:589).
 * top/left are the (possibly smoothed) reference arrays; writes pred[h][w]
 * in the block's orientation (internally swaps for horizontal modes). */
static void pred_angular(const Ctx *c, const int32_t *top,
                         const int32_t *left, int w0, int h0, int mode,
                         int comp, int32_t *pred_out) {
    int pred_mode = wide_angle(w0, h0, mode);
    int top_len = 2 * w0, left_len = 2 * h0;
    int is_ver = pred_mode >= DIA_IDX;
    int ang_mode = is_ver ? (pred_mode - VER_IDX) : -(pred_mode - HOR_IDX);
    int abs_ang = ANG_TABLE[ang_mode < 0 ? -ang_mode : ang_mode];
    int inv_angle = INV_ANG_TABLE[ang_mode < 0 ? -ang_mode : ang_mode];
    int angle = (ang_mode >= 0 ? 1 : -1) * abs_ang;

    int w = w0, h = h0;
    const int32_t *main_src, *side_src;
    int main_len, side_len;
    if (!is_ver) {
        w = h0;
        h = w0;
        main_src = left;
        side_src = top;
        main_len = left_len + 1;
        side_len = top_len + 1;
    } else {
        main_src = top;
        side_src = left;
        main_len = top_len + 1;
        side_len = left_len + 1;
    }

    int32_t ref_buf[512];
    int32_t *ref_main;
    int off;
    if (angle < 0) {
        int size_side = h;
        int total = size_side + 2 * w + 3;
        memset(ref_buf, 0, sizeof(int32_t) * total);
        off = size_side;
        int n = w + 2;
        if (n > main_len) n = main_len;
        for (int i = 0; i < n; i++) ref_buf[off + i] = main_src[i];
        for (int k = -size_side; k < 0; k++) {
            int sidx = ((-k * inv_angle + 256) >> 9);
            if (sidx > size_side) sidx = size_side;
            ref_buf[off + k] = side_src[sidx];
        }
        ref_main = ref_buf;
    } else {
        int log2_ratio = ilog2(w) - ilog2(h);
        int s_ext = log2_ratio > 0 ? log2_ratio : 0;
        (void)s_ext;
        int max_index = 2; /* (mrl << s_ext) + 2 with mrl = 0 */
        int ref_len = is_ver ? top_len : left_len;
        int total = ref_len + 1 + max_index + 1;
        memset(ref_buf, 0, sizeof(int32_t) * total);
        off = 0;
        int n = ref_len + 1;
        if (n > main_len) n = main_len;
        for (int i = 0; i < n; i++) ref_buf[i] = main_src[i];
        int32_t val = ref_buf[ref_len];
        for (int i = 0; i < max_index; i++) ref_buf[ref_len + 1 + i] = val;
        ref_main = ref_buf;
    }

    /* dst in swapped orientation [h][w] */
    int32_t dst_local[64 * 64];
    int32_t *dst = dst_local;
    int pdpc_ok = (w >= 4 && h >= 4);
    /* NOTE: PDPC enablement uses the swapped dims here, matching the
     * numpy golden (w,h are swapped together so the test is symmetric) */

    if (angle == 0) {
        for (int yy = 0; yy < h; yy++)
            for (int xx = 0; xx < w; xx++)
                dst[(size_t)yy * w + xx] = ref_main[off + 1 + xx];
        if (pdpc_ok) {
            int scale = ((ilog2(w) - 2) + (ilog2(h) - 2) + 2) >> 2;
            static const int lev_map[4] = {3, 6, 12, 24};
            int lev = lev_map[scale];
            if (lev > w) lev = w;
            int corner = side_src[0];
            for (int yy = 0; yy < h; yy++) {
                int left_v = side_src[yy + 1];
                for (int xx = 0; xx < lev; xx++) {
                    int sh = (xx << 1) >> scale;
                    int wl = sh > 31 ? 0 : (32 >> sh);
                    int32_t v = (wl * (left_v - corner) +
                                 ref_main[off + xx + 1] * 64 + 32) >> 6;
                    dst[(size_t)yy * w + xx] = lclip(v, 0, c->pel_max);
                }
            }
        }
    } else {
        int frac_needed = (abs_ang & 0x1F) != 0;
        if (frac_needed) {
            if (comp == 0) {
                int d1 = pred_mode - HOR_IDX;
                if (d1 < 0) d1 = -d1;
                int d2 = pred_mode - VER_IDX;
                if (d2 < 0) d2 = -d2;
                int diff = d1 < d2 ? d1 : d2;
                int log2_size = (ilog2(w) + ilog2(h)) >> 1;
                int filter_flag = diff > INTRA_FILTER_THRESH[log2_size];
                int use_cubic = !filter_flag;
                const int(*f)[4] = use_cubic ? CHROMA_FILTER : GAUSS_FILTER;
                for (int yy = 0; yy < h; yy++) {
                    int32_t delta = angle * (yy + 1);
                    int di = (int)(delta >> 5);
                    int frac = (int)(delta & 31);
                    const int *co = f[frac];
                    int base = off + di + 1;
                    for (int xx = 0; xx < w; xx++) {
                        int32_t v = (co[0] * ref_main[base + xx - 1] +
                                     co[1] * ref_main[base + xx] +
                                     co[2] * ref_main[base + xx + 1] +
                                     co[3] * ref_main[base + xx + 2] +
                                     32) >>
                                    6;
                        if (use_cubic) v = lclip(v, 0, c->pel_max);
                        dst[(size_t)yy * w + xx] = v;
                    }
                }
            } else {
                for (int yy = 0; yy < h; yy++) {
                    int32_t delta = angle * (yy + 1);
                    int di = (int)(delta >> 5);
                    int frac = (int)(delta & 31);
                    int base = off + di + 1;
                    for (int xx = 0; xx < w; xx++) {
                        dst[(size_t)yy * w + xx] =
                            ((32 - frac) * ref_main[base + xx] +
                             frac * ref_main[base + xx + 1] + 16) >>
                            5;
                    }
                }
            }
        } else {
            for (int yy = 0; yy < h; yy++) {
                int32_t delta = angle * (yy + 1);
                int base = off + (int)(delta >> 5) + 1;
                for (int xx = 0; xx < w; xx++)
                    dst[(size_t)yy * w + xx] = ref_main[base + xx];
            }
        }
        if (pdpc_ok && angle > 0) {
            int side_size = h;
            int max_scale = 2;
            int angular_scale =
                (bitlen(side_size) - 1) - (bitlen(3 * inv_angle - 2) - 1 - 8);
            if (angular_scale > max_scale) angular_scale = max_scale;
            if (angular_scale >= 0) {
                int nx = 3 << angular_scale;
                if (nx > w) nx = w;
                for (int xx = 0; xx < nx; xx++) {
                    int inv_sum = 256 + inv_angle * (xx + 1);
                    int sh = (2 * xx) >> angular_scale;
                    int wl = sh > 31 ? 0 : (32 >> sh);
                    for (int yy = 0; yy < h; yy++) {
                        int sidx = yy + (inv_sum >> 9) + 1;
                        if (sidx > side_len - 1) sidx = side_len - 1;
                        int32_t lv = side_src[sidx];
                        int32_t sub = dst[(size_t)yy * w + xx];
                        dst[(size_t)yy * w + xx] =
                            sub + ((wl * (lv - sub) + 32) >> 6);
                    }
                }
            }
        }
    }

    if (!is_ver) {
        /* transpose into output [h0][w0] (dst is [w0][h0] here) */
        for (int yy = 0; yy < h0; yy++)
            for (int xx = 0; xx < w0; xx++)
                pred_out[(size_t)yy * w0 + xx] = dst[(size_t)xx * h0 + yy];
    } else {
        memcpy(pred_out, dst, sizeof(int32_t) * (size_t)w0 * h0);
    }
}

/* dequant + separable inverse transform into resi[h][w]
 * (recon_np.dequant_block + inverse_transform; Quant.cpp:292 dequant,
 * TrQuant_EMT.cpp _fastInverseMM).  coef plane region at (x,y). */
static void dequant_itx(const Ctx *c, int comp, int x, int y, int w, int h,
                        int qp, int dep_quant, int max_x, int max_y,
                        const int32_t *mh, const int32_t *mv,
                        int lf_off, int lf_meta, int32_t *resi) {
    int pi = comp ? 1 : 0;
    const int32_t *coef = c->coef[comp];
    int W = c->W[pi];
    int log2w = ilog2(w), log2h = ilog2(h);
    int transform_shift = MAX_TR_RANGE - c->bit_depth - ((log2w + log2h) >> 1);
    int needs_sqrt2 = ((log2w + log2h) & 1) == 1;
    int i_transform_shift = transform_shift + (needs_sqrt2 ? -1 : 0);
    int qp_per, qp_rem;
    if (dep_quant) {
        qp_per = (qp + 1) / 6;
        qp_rem = qp + 1 - 6 * qp_per;
    } else {
        qp_per = qp / 6;
        qp_rem = qp % 6;
    }
    int right_shift = 6 + (dep_quant ? 1 : 0) - (i_transform_shift + qp_per);
    int64_t scale = INV_QUANT_SCALES[needs_sqrt2 ? 1 : 0][qp_rem];
    int target_bd = 64 + right_shift - 7;
    if (target_bd > MAX_TR_RANGE + 1) target_bd = MAX_TR_RANGE + 1;
    int64_t input_max = ((int64_t)1 << (target_bd - 1)) - 1;

    /* dequantized coefficients, bounded region only.  Values are clipped
     * to the 16-bit transform range, so the transform passes fit int32:
     * |acc| <= 64 * 2^15 * 2^7 = 2^28. */
    int32_t deq[64 * 64];
    memset(deq, 0, sizeof(int32_t) * (size_t)w * h);
    for (int yy = 0; yy <= max_y; yy++) {
        for (int xx = 0; xx <= max_x; xx++) {
            int64_t lv = coef[(size_t)(y + yy) * W + (x + xx)];
            if (lv == 0) continue;
            int64_t cl = lclip(lv, -input_max - 1, input_max);
            int64_t d;
            if (right_shift > 0)
                d = (cl * scale + ((int64_t)1 << (right_shift - 1))) >>
                    right_shift;
            else
                d = (cl * scale) << (-right_shift);
            deq[(size_t)yy * w + xx] = (int32_t)lclip(d, TR_CLIP_MIN,
                                                      TR_CLIP_MAX);
        }
    }

    /* inverse LFNST between dequant and the primary transform
     * (TrQuant::xInvLfnst TrQuant.cpp:201, invLfnstNxNCore :79): the 16
     * scan-ordered coefficients through the kernel, output into the
     * top-left 4x4 / 8x8 region (optionally transposed) */
    if (lf_off >= 0) {
        const int32_t *lf = c->lfnst + lf_off;
        int tr = lf_meta & 1;
        int sb8 = (lf_meta & 2) != 0;
        int zero = (lf_meta & 4) ? 16 : 8;
        int nout = sb8 ? 48 : 16;
        int32_t src[16];
        for (int k = 0; k < 16; k++)
            src[k] = deq[(size_t)SCAN16[k][0] * w + SCAN16[k][1]];
        int32_t out[48];
        for (int i2 = 0; i2 < nout; i2++) {
            int64_t acc = 0;
            const int32_t *row = lf + (size_t)i2 * 16;
            for (int j = 0; j < zero; j++)
                acc += (int64_t)row[j] * src[j];
            out[i2] = (int32_t)lclip((acc + 64) >> 7, -(1 << 15),
                                     (1 << 15) - 1);
        }
        if (!sb8) {
            for (int r = 0; r < 4; r++)
                for (int cc = 0; cc < 4; cc++)
                    deq[(size_t)r * w + cc] =
                        tr ? out[cc * 4 + r] : out[r * 4 + cc];
            if (max_x < 3) max_x = 3;
            if (max_y < 3) max_y = 3;
        } else {
            if (!tr) {
                for (int r = 0; r < 4; r++)
                    for (int cc = 0; cc < 8; cc++)
                        deq[(size_t)r * w + cc] = out[r * 8 + cc];
                for (int r = 4; r < 8; r++)
                    for (int cc = 0; cc < 4; cc++)
                        deq[(size_t)r * w + cc] = out[32 + (r - 4) * 4 + cc];
            } else {
                for (int r = 0; r < 8; r++)
                    for (int cc = 0; cc < 4; cc++)
                        deq[(size_t)r * w + cc] = out[cc * 8 + r];
                for (int r = 0; r < 4; r++)
                    for (int cc = 4; cc < 8; cc++)
                        deq[(size_t)r * w + cc] = out[32 + (cc - 4) * 4 + r];
            }
            if (max_x < 7) max_x = 7;
            if (max_y < 7) max_y = 7;
        }
    }

    /* pass 1 (vertical): t[x][j] = sum_k deq[k][x] * mv[k][j] —
     * accumulate per nonzero coefficient with a contiguous inner loop
     * (sparse coefficients skip entirely) */
    int s1 = 7;
    int s2 = (6 + MAX_TR_RANGE - 1) - c->bit_depth;
    int32_t t[64 * 64];
    int kmax1 = max_y + 1; /* rows with nonzero coeffs */
    int xmax = max_x + 1;  /* cols with nonzero coeffs */
    for (int xx = 0; xx < xmax; xx++) {
        int32_t acc[64];
        memset(acc, 0, sizeof(int32_t) * h);
        for (int k = 0; k < kmax1; k++) {
            int32_t cv = deq[(size_t)k * w + xx];
            if (cv == 0) continue;
            const int32_t *mvr = mv + (size_t)k * h;
            for (int j = 0; j < h; j++)
                acc[j] += cv * mvr[j];
        }
        int32_t *tc = t + (size_t)xx * h;
        for (int j = 0; j < h; j++) {
            int32_t v = (acc[j] + (1 << (s1 - 1))) >> s1;
            if (v < TR_CLIP_MIN) v = TR_CLIP_MIN;
            if (v > TR_CLIP_MAX) v = TR_CLIP_MAX;
            tc[j] = v;
        }
    }
    /* pass 2 (horizontal): r[j][x'] = sum_k t[k][j] * mh[k][x'] */
    for (int j = 0; j < h; j++) {
        int32_t acc[64];
        memset(acc, 0, sizeof(int32_t) * w);
        for (int k = 0; k < xmax; k++) {
            int32_t v = t[(size_t)k * h + j];
            if (v == 0) continue;
            const int32_t *mhr = mh + (size_t)k * w;
            for (int xp = 0; xp < w; xp++)
                acc[xp] += v * mhr[xp];
        }
        int32_t *rr = resi + (size_t)j * w;
        for (int xp = 0; xp < w; xp++) {
            int32_t v = (acc[xp] + (1 << (s2 - 1))) >> s2;
            if (v < TR_CLIP_MIN) v = TR_CLIP_MIN;
            if (v > TR_CLIP_MAX) v = TR_CLIP_MAX;
            rr[xp] = v;
        }
    }
}

/* transform-skip residual: TS dequant, no transform
 * (recon_np.ts_residual / dequant_block(ts=True); Quant.cpp DeQuant) */
static void ts_dequant(const Ctx *c, int comp, int x, int y, int w, int h,
                       int qp, int max_x, int max_y, int32_t *resi) {
    int pi = comp ? 1 : 0;
    const int32_t *coef = c->coef[comp];
    int W = c->W[pi];
    int floorq = 4 + 6 * c->imi;
    if (qp < floorq) qp = floorq;
    int qp_per = qp / 6, qp_rem = qp % 6;
    int right_shift = 6 - qp_per;
    int64_t scale = INV_QUANT_SCALES[0][qp_rem];
    int target_bd = 64 + right_shift - 7;
    if (target_bd > MAX_TR_RANGE + 1) target_bd = MAX_TR_RANGE + 1;
    int64_t input_max = ((int64_t)1 << (target_bd - 1)) - 1;
    memset(resi, 0, sizeof(int32_t) * (size_t)w * h);
    for (int yy = 0; yy <= max_y; yy++)
        for (int xx = 0; xx <= max_x; xx++) {
            int64_t lv = coef[(size_t)(y + yy) * W + (x + xx)];
            if (lv == 0) continue;
            int64_t cl = lclip(lv, -input_max - 1, input_max);
            int64_t d;
            if (right_shift > 0)
                d = (cl * scale + ((int64_t)1 << (right_shift - 1)))
                    >> right_shift;
            else
                d = (cl * scale) << (-right_shift);
            resi[(size_t)yy * w + xx] =
                (int32_t)lclip(d, -(1 << MAX_TR_RANGE),
                               (1 << MAX_TR_RANGE) - 1);
        }
}

/* matrix intra prediction (recon_np.pred_mip; Mip::PredictorMIP,
 * MatrixIntraPrediction.cpp:60): Haar boundary downsample, rebased
 * matrix product, linear upsampling. */
static void pred_mip(const Ctx *c, const int32_t *top, const int32_t *left,
                     int w, int h, int mode, int transpose, int size_id,
                     int32_t *pred) {
    const int32_t *ref_top = top + 1, *ref_left = left + 1;
    int bdry = size_id == 0 ? 2 : 4;
    int red = size_id < 2 ? 4 : 8;
    int up_h = w / red, up_v = h / red;
    int bd = c->bit_depth;

    int32_t t_red[4], l_red[4];
    for (int side = 0; side < 2; side++) {
        const int32_t *src = side ? ref_left : ref_top;
        int n = side ? h : w;
        int32_t *dst = side ? l_red : t_red;
        if (n > bdry) {
            int f = n / bdry, lg = ilog2(f);
            for (int i2 = 0; i2 < bdry; i2++) {
                int64_t s = 0;
                for (int j = 0; j < f; j++) s += src[i2 * f + j];
                dst[i2] = (int32_t)((s + (1 << (lg - 1))) >> lg);
            }
        } else {
            for (int i2 = 0; i2 < bdry; i2++) dst[i2] = src[i2];
        }
    }
    int input_size = 2 * bdry;
    int32_t inp[8];
    for (int i2 = 0; i2 < bdry; i2++) {
        inp[i2] = transpose ? l_red[i2] : t_red[i2];
        inp[bdry + i2] = transpose ? t_red[i2] : l_red[i2];
    }
    int32_t in_off = inp[0];
    inp[0] = size_id < 2 ? ((1 << (bd - 1)) - in_off) : 0;
    for (int i2 = 1; i2 < input_size; i2++) inp[i2] -= in_off;
    int64_t isum = 0;
    for (int i2 = 0; i2 < input_size; i2++) isum += inp[i2];
    int64_t offset = (1 << 5) - 32 * isum;

    int red_size = size_id == 2 ? 1 : 0;
    int wrow_len = input_size - red_size;
    const int32_t *mat = c->mip[size_id]
        + (size_t)mode * (red * red) * wrow_len;
    int32_t out8[8][8];
    for (int pos = 0; pos < red * red; pos++) {
        const int32_t *wr = mat + (size_t)pos * wrow_len;
        int64_t acc = red_size ? 0 : (int64_t)inp[0] * wr[0];
        for (int i2 = 1; i2 < input_size; i2++)
            acc += (int64_t)inp[i2] * wr[i2 - red_size];
        int64_t v = ((acc + offset) >> 6) + in_off;
        v = lclip(v, 0, c->pel_max);
        int r = pos / red, cc = pos % red;
        if (transpose)
            out8[cc][r] = (int32_t)v;
        else
            out8[r][cc] = (int32_t)v;
    }

    if (up_h == 1 && up_v == 1) {
        for (int r = 0; r < h; r++)
            for (int cc = 0; cc < w; cc++)
                pred[(size_t)r * w + cc] = out8[r][cc];
        return;
    }
    /* horizontal upsampling (rows land at y = (k+1)*up_v - 1) */
    int32_t hor[8][64];
    if (up_h > 1) {
        int lg = ilog2(up_h), ro = 1 << (lg - 1);
        for (int k = 0; k < red; k++) {
            int32_t prev = ref_left[(k + 1) * up_v - 1];
            int pos = 0;
            for (int j = 0; j < red; j++) {
                int32_t behind = out8[k][j];
                int32_t diff = behind - prev;
                int32_t scaled = prev * up_h + ro;
                for (int i2 = 0; i2 < up_h; i2++) {
                    scaled += diff;
                    hor[k][pos++] = scaled >> lg;
                }
                prev = behind;
            }
        }
    } else {
        for (int k = 0; k < red; k++)
            for (int j = 0; j < red; j++) hor[k][j] = out8[k][j];
    }
    if (up_v == 1) {
        for (int r = 0; r < h; r++)
            for (int cc = 0; cc < w; cc++)
                pred[(size_t)r * w + cc] = hor[r][cc];
        return;
    }
    int lg = ilog2(up_v), ro = 1 << (lg - 1);
    for (int cc = 0; cc < w; cc++) {
        int32_t prev = ref_top[cc];
        for (int j = 0; j < red; j++) {
            int32_t behind = hor[j][cc];
            int32_t diff = behind - prev;
            int32_t scaled = prev * up_v + ro;
            for (int i2 = 0; i2 < up_v; i2++) {
                scaled += diff;
                pred[(size_t)(j * up_v + i2) * w + cc] = scaled >> lg;
            }
            prev = behind;
        }
    }
}

/* cross-component linear model chroma prediction (recon_np.pred_cclm;
 * xGetLumaRecPixels / xGetLMParameters / predIntraChromaLM).  Negative
 * sample indices wrap (python-indexing parity with the host golden). */
static const int8_t CCLM_DIV[16] = {0, 7, 6, 5, 5, 4, 4, 3,
                                    3, 2, 2, 1, 1, 1, 1, 0};

static void pred_cclm(const Ctx *c, int comp, int cu_idx, int tu_order,
                      int x, int y, int w, int h, int mode,
                      const int32_t *top_ref, const int32_t *left_ref,
                      int32_t *pred) {
    const int32_t *luma = c->reco[0];
    int lw = c->W[0], lh = c->H[0];
    int mult = c->sub_w, rec2 = c->sub_h;
    int stro = c->sub_w == 1 ? 0 : 1;
    const int32_t *cm = c->cu_meta + (size_t)cu_idx * CM_STRIDE;
    int cu_cx = cm[2], cu_cy = cm[3];
    int lx = x * c->sub_w, ly = y * c->sub_h;
    int first_row = (ly & ((1 << c->ctu_log2) - 1)) == 0;
    int t3[5], t5[7], t6[8];
    if (c->fmt == 2) {
        int a3[5] = {2, 1, 1, 2, 2};
        int a5[7] = {0, 2, 1, 1, 0, 2, 2};
        int a6[8] = {2, 1, 1, 0, 0, 0, 2, 2};
        memcpy(t3, a3, sizeof(a3));
        memcpy(t5, a5, sizeof(a5));
        memcpy(t6, a6, sizeof(a6));
    } else if (c->fmt == 3) {
        int a3[5] = {1, 0, 0, 0, 0};
        int a5[7] = {0, 1, 0, 0, 0, 0, 0};
        int a6[8] = {1, 0, 0, 0, 0, 0, 0, 0};
        memcpy(t3, a3, sizeof(a3));
        memcpy(t5, a5, sizeof(a5));
        memcpy(t6, a6, sizeof(a6));
    } else {
        int a3[5] = {2, 1, 1, 2, 2};
        int a5[7] = {1, 4, 1, 1, 1, 4, 3};
        int a6[8] = {2, 1, 1, 2, 1, 1, 4, 3};
        memcpy(t3, a3, sizeof(a3));
        memcpy(t5, a5, sizeof(a5));
        memcpy(t6, a6, sizeof(a6));
    }

#define LUM(r, cc2)                                                     \
    luma[(size_t)((r) < 0 ? (r) + lh : ((r) >= lh ? lh - 1 : (r))) * lw \
         + ((cc2) < 0 ? (cc2) + lw : ((cc2) >= lw ? lw - 1 : (cc2)))]

    int cu_above = avail(c, cu_cx, cu_cy - 1, comp, cu_idx, tu_order);
    int cu_left = avail(c, cu_cx - 1, cu_cy, comp, cu_idx, tu_order);
    int above_flag = cu_above || y > cu_cy;
    int left_flag = cu_left || x > cu_cx;
    int build_above = above_flag, build_left = left_flag;

    int above_avail = 0, left_avail = 0;
    int actual_top = 0, actual_left = 0;
    int unit = 2;
    int tu_w_units = w / unit, tu_h_units = h / unit;
    if (mode == 69) { /* MDLM_T */
        int avai_above = 0;
        if (above_flag) {
            avai_above = tu_w_units;
            int ar = (2 * w) / unit - tu_w_units;
            int lim = h / unit;
            if (ar > lim) ar = lim;
            for (int u = 0; u < ar; u++) {
                if (avail(c, x + w + u * unit, y - 1, comp, cu_idx,
                          tu_order))
                    avai_above++;
                else
                    break;
            }
        }
        above_avail = avai_above >= tu_w_units;
        actual_top = unit * avai_above;
    } else if (mode == 68) { /* MDLM_L */
        int avai_left = 0;
        if (left_flag) {
            avai_left = tu_h_units;
            int lb = (2 * h) / unit - tu_h_units;
            int lim = w / unit;
            if (lb > lim) lb = lim;
            for (int u = 0; u < lb; u++) {
                if (avail(c, x - 1, y + h + u * unit, comp, cu_idx,
                          tu_order))
                    avai_left++;
                else
                    break;
            }
        }
        left_avail = avai_left >= tu_h_units;
        actual_left = unit * avai_left;
    } else { /* LM_CHROMA */
        above_avail = above_flag;
        left_avail = left_flag;
        actual_top = above_avail ? w : 0;
        actual_left = left_avail ? h : 0;
    }

#define DS_TOP(i2, dstv)                                                  \
    do {                                                                  \
        int xx = lx + mult * (i2);                                        \
        int lt = ((i2) == 0 && !build_left) ? xx : xx - 1;                \
        if (first_row) {                                                  \
            int r = ly - 1;                                               \
            dstv = (t3[0] * LUM(r, xx) + t3[1] * LUM(r, lt)               \
                    + t3[2] * LUM(r, xx + 1) + t3[3]) >> t3[4];           \
        } else if (c->collocated) {                                       \
            int r = ly - rec2;                                            \
            dstv = (t5[0] * LUM(r - stro, xx) + t5[1] * LUM(r, xx)        \
                    + t5[2] * LUM(r, lt) + t5[3] * LUM(r, xx + 1)         \
                    + t5[4] * LUM(r + stro, xx) + t5[5]) >> t5[6];        \
        } else {                                                          \
            int r = ly - rec2;                                            \
            dstv = (t6[0] * LUM(r, xx) + t6[1] * LUM(r, lt)               \
                    + t6[2] * LUM(r, xx + 1) + t6[3] * LUM(r + stro, xx)  \
                    + t6[4] * LUM(r + stro, lt)                           \
                    + t6[5] * LUM(r + stro, xx + 1) + t6[6]) >> t6[7];    \
        }                                                                 \
    } while (0)

#define DS_LEFT(j2, dstv)                                                 \
    do {                                                                  \
        int yy = ly + rec2 * (j2);                                        \
        int base = lx - 2 - (c->sub_w - 1);                               \
        if (c->collocated) {                                              \
            int tt = ((j2) == 0 && !build_above) ? yy : yy - stro;        \
            dstv = (t5[0] * LUM(tt, base + 1) + t5[1] * LUM(yy, base + 1) \
                    + t5[2] * LUM(yy, base) + t5[3] * LUM(yy, base + 2)   \
                    + t5[4] * LUM(yy + stro, base + 1) + t5[5]) >> t5[6]; \
        } else {                                                          \
            dstv = (t6[0] * LUM(yy, base + 1) + t6[1] * LUM(yy, base)     \
                    + t6[2] * LUM(yy, base + 2)                           \
                    + t6[3] * LUM(yy + stro, base + 1)                    \
                    + t6[4] * LUM(yy + stro, base)                        \
                    + t6[5] * LUM(yy + stro, base + 2) + t6[6])           \
                   >> t6[7];                                              \
        }                                                                 \
    } while (0)

    int above_is4 = left_avail ? 0 : 1;
    int left_is4 = above_avail ? 0 : 1;
    int start_t = actual_top >> (2 + above_is4);
    int step_t = actual_top >> (1 + above_is4);
    if (step_t < 1) step_t = 1;
    int start_l = actual_left >> (2 + left_is4);
    int step_l = actual_left >> (1 + left_is4);
    if (step_l < 1) step_l = 1;

    int32_t sel_l[4] = {0, 0, 0, 0}, sel_c[4] = {0, 0, 0, 0};
    int cnt_t = 0, cnt_l = 0, cnt = 0;
    if (above_avail) {
        cnt_t = (1 + above_is4) << 1;
        if (cnt_t > actual_top) cnt_t = actual_top;
        int pos = start_t;
        while (cnt < cnt_t) {
            DS_TOP(pos, sel_l[cnt]);
            sel_c[cnt] = top_ref[1 + pos];
            pos += step_t;
            cnt++;
        }
    }
    if (left_avail) {
        cnt_l = (1 + left_is4) << 1;
        if (cnt_l > actual_left) cnt_l = actual_left;
        int pos = start_l, k = 0;
        while (k < cnt_l) {
            DS_LEFT(pos, sel_l[k + cnt_t]);
            sel_c[k + cnt_t] = left_ref[1 + pos];
            pos += step_l;
            k++;
        }
    }
    cnt = cnt_l + cnt_t;
    if (cnt == 2) {
        sel_l[3] = sel_l[0]; sel_c[3] = sel_c[0];
        sel_l[2] = sel_l[1]; sel_c[2] = sel_c[1];
        sel_l[0] = sel_l[1]; sel_c[0] = sel_c[1];
        sel_l[1] = sel_l[3]; sel_c[1] = sel_c[3];
    }

    int mn[2] = {0, 2}, mx[2] = {1, 3};
    int tswap;
    if (sel_l[mn[0]] > sel_l[mn[1]]) {
        tswap = mn[0]; mn[0] = mn[1]; mn[1] = tswap;
    }
    if (sel_l[mx[0]] > sel_l[mx[1]]) {
        tswap = mx[0]; mx[0] = mx[1]; mx[1] = tswap;
    }
    if (sel_l[mn[0]] > sel_l[mx[1]]) {
        tswap = mn[0]; mn[0] = mx[0]; mx[0] = tswap;
        tswap = mn[1]; mn[1] = mx[1]; mx[1] = tswap;
    }
    if (sel_l[mn[1]] > sel_l[mx[0]]) {
        tswap = mn[1]; mn[1] = mx[0]; mx[0] = tswap;
    }
    int32_t min_l = (sel_l[mn[0]] + sel_l[mn[1]] + 1) >> 1;
    int32_t min_c = (sel_c[mn[0]] + sel_c[mn[1]] + 1) >> 1;
    int32_t max_l = (sel_l[mx[0]] + sel_l[mx[1]] + 1) >> 1;
    int32_t max_c = (sel_c[mx[0]] + sel_c[mx[1]] + 1) >> 1;

    int a = 0, b, shift = 0;
    if (left_avail || above_avail) {
        int diff = max_l - min_l;
        if (diff > 0) {
            int diff_c = max_c - min_c;
            int xsh = bitlen(diff) - 1;
            int norm_diff = ((diff << 4) >> xsh) & 15;
            int v = CCLM_DIV[norm_diff] | 8;
            xsh += norm_diff != 0;
            int adc = diff_c < 0 ? -diff_c : diff_c;
            int ysh = diff_c == 0 ? 0 : bitlen(adc) - 1 + 1;
            int add = (1 << ysh) >> 1;
            a = (diff_c * v + add) >> ysh;
            shift = 3 + xsh - ysh;
            if (shift < 1) {
                shift = 1;
                a = a == 0 ? 0 : (a < 0 ? -15 : 15);
            }
            b = min_c - ((a * min_l) >> shift);
        } else {
            b = min_c;
        }
    } else {
        b = 1 << (c->bit_depth - 1);
    }

    for (int j = 0; j < h; j++) {
        int yy = ly + rec2 * j;
        for (int i2 = 0; i2 < w; i2++) {
            int xx = lx + mult * i2;
            int32_t ds;
            if (c->collocated) {
                int lt = (i2 == 0 && !build_left) ? xx : xx - 1;
                int tt = (j == 0 && !build_above) ? yy : yy - stro;
                ds = (t5[0] * LUM(tt, xx) + t5[1] * LUM(yy, xx)
                      + t5[2] * LUM(yy, lt) + t5[3] * LUM(yy, xx + 1)
                      + t5[4] * LUM(yy + stro, xx) + t5[5]) >> t5[6];
            } else {
                int lt;
                if (i2 == 0 && !build_left)
                    lt = xx;
                else {
                    lt = xx - 1;
                    if (lt < 0) lt = 0;
                }
                int x1 = xx + 1 >= lw ? lw - 1 : xx + 1;
                ds = (t6[0] * LUM(yy, xx) + t6[1] * LUM(yy, lt)
                      + t6[2] * LUM(yy, x1) + t6[3] * LUM(yy + stro, xx)
                      + t6[4] * LUM(yy + stro, lt)
                      + t6[5] * LUM(yy + stro, x1) + t6[6]) >> t6[7];
            }
            int64_t p = b + (((int64_t)a * ds) >> shift);
            pred[(size_t)j * w + i2] = (int32_t)lclip(p, 0, c->pel_max);
        }
    }
#undef LUM
#undef DS_TOP
#undef DS_LEFT
}

/* process TUs from index `start`; returns the index of the first TU that
 * needs the Python fallback (or n_tus when done) */
static PyObject *mod_run_from(PyObject *self, PyObject *args) {
    (void)self;
    int start, n_tus;
    Py_buffer td_buf, cm_buf, bank_buf, off_buf;
    Py_buffer reco_bufs[3], coef_bufs[3];
    Py_buffer cum_buf, cumc_buf, om_buf;
    Py_buffer lf_buf, mip_bufs[3];
    int W0, H0, Wc, Hc;
    int bit_depth, wpp, ctu_log2, sub_w, sub_h, num_comp;
    int fmt, collocated, imi;
    if (!PyArg_ParseTuple(
            args, "iiy*y*w*y*w*y*w*y*iiiiy*y*w*y*y*iiiiiiy*y*y*y*iii",
            &start, &n_tus,
            &td_buf, &cm_buf, &reco_bufs[0], &coef_bufs[0], &reco_bufs[1],
            &coef_bufs[1], &reco_bufs[2], &coef_bufs[2], &W0, &H0, &Wc, &Hc,
            &cum_buf, &cumc_buf, &om_buf, &bank_buf, &off_buf, &bit_depth,
            &wpp, &ctu_log2, &sub_w, &sub_h, &num_comp,
            &lf_buf, &mip_bufs[0], &mip_bufs[1], &mip_bufs[2],
            &fmt, &collocated, &imi))
        return NULL;

    Ctx c;
    for (int i = 0; i < 3; i++) {
        c.reco[i] = (int32_t *)reco_bufs[i].buf;
        c.coef[i] = (const int32_t *)coef_bufs[i].buf;
    }
    c.W[0] = W0;
    c.H[0] = H0;
    c.W[1] = Wc;
    c.H[1] = Hc;
    c.W[2] = Wc;
    c.H[2] = Hc;
    c.cu_map = (const int32_t *)cum_buf.buf;
    c.cu_map_c = (const int32_t *)cumc_buf.buf;
    c.order_map = (int32_t *)om_buf.buf;
    c.om_w = W0 >> 2;
    c.cmc_w = Wc >> 1;
    c.cu_meta = (const int32_t *)cm_buf.buf;
    c.bank = (const int32_t *)bank_buf.buf;
    c.bank_off = (const int32_t *)off_buf.buf;
    c.bit_depth = bit_depth;
    c.pel_max = (1 << bit_depth) - 1;
    c.wpp = wpp;
    c.ctu_log2 = ctu_log2;
    c.sub_w = sub_w;
    c.sub_h = sub_h;
    c.num_comp = num_comp;
    c.lfnst = (const int32_t *)lf_buf.buf;
    for (int i = 0; i < 3; i++)
        c.mip[i] = (const int32_t *)mip_bufs[i].buf;
    c.fmt = fmt;
    c.collocated = collocated;
    c.imi = imi;

    const int32_t *td = (const int32_t *)td_buf.buf;
    int i = start;
    static _Thread_local int32_t pred[64 * 64];
    static _Thread_local int32_t resi[64 * 64];
    static _Thread_local int32_t top[260], left[260], ftop[260],
        fleft[260];

    Py_BEGIN_ALLOW_THREADS
    for (; i < n_tus; i++) {
        const int32_t *d = td + (size_t)i * TD_STRIDE;
        int flags = d[0];
        if (!(flags & F_ELIG))
            break;
        int cu_idx = d[1];
        int dep_quant = (flags & F_DEPQ) ? 1 : 0;
        int n_comp_here = (flags & F_CHROMA) ? 3 : 1;
        for (int comp = 0; comp < n_comp_here; comp++) {
            if (comp == 0 && !(flags & F_COMP0))
                continue;
            const int32_t *cd = d + TD_COMP_BASE + comp * TD_COMP_STRIDE;
            int x = cd[0], y = cd[1], w = cd[2], h = cd[3];
            int cbf = cd[4], mode = cd[5], filt = cd[6], qp = cd[7];
            int msx = cd[8], msy = cd[9], mat_h = cd[10], mat_v = cd[11];
            int special = cd[12] & 15, is_ts = cd[12] >> 4;
            int lf_off = cd[13], lf_meta = cd[14];
            int mip_meta = cd[15];
            int pi = comp ? 1 : 0;
            int32_t *reco = c.reco[comp == 0 ? 0 : comp];
            int W = c.W[pi];
            int top_len = 2 * w + 1, left_len = 2 * h + 1;

            fill_reference(&c, comp, cu_idx, i, x, y, w, h, top, left);
            const int32_t *utop = top, *uleft = left;
            if (filt) {
                filter_reference(top, left, top_len, left_len, ftop, fleft);
                utop = ftop;
                uleft = fleft;
            }
            int do_pdpc = (w >= 4 && h >= 4);
            if (special == SP_MIP) {
                pred_mip(&c, top, left, w, h, mode, mip_meta & 1,
                         mip_meta >> 1, pred);
            } else if (special == SP_CCLM) {
                pred_cclm(&c, comp, cu_idx, i, x, y, w, h, mode, top,
                          left, pred);
            } else if (mode == PLANAR_IDX) {
                pred_planar(utop, uleft, w, h, pred);
                if (do_pdpc) pdpc_dc_planar(pred, utop, uleft, w, h);
            } else if (mode == DC_IDX) {
                pred_dc(utop, uleft, w, h, pred);
                if (do_pdpc) pdpc_dc_planar(pred, utop, uleft, w, h);
            } else {
                pred_angular(&c, utop, uleft, w, h, mode, comp, pred);
            }

            if (cbf) {
                if (is_ts) {
                    ts_dequant(&c, comp, x, y, w, h, qp, msx, msy, resi);
                } else {
                const int32_t *mhp = c.bank + c.bank_off[mat_h];
                const int32_t *mvp = c.bank + c.bank_off[mat_v];
                dequant_itx(&c, comp, x, y, w, h, qp, dep_quant, msx, msy,
                            mhp, mvp, lf_off, lf_meta, resi);
                }
                for (int yy = 0; yy < h; yy++)
                    for (int xx = 0; xx < w; xx++) {
                        int32_t v = pred[(size_t)yy * w + xx] +
                                    resi[(size_t)yy * w + xx];
                        reco[(size_t)(y + yy) * W + (x + xx)] =
                            (int32_t)lclip(v, 0, c.pel_max);
                    }
            } else {
                for (int yy = 0; yy < h; yy++)
                    for (int xx = 0; xx < w; xx++)
                        reco[(size_t)(y + yy) * W + (x + xx)] = (int32_t)lclip(
                            pred[(size_t)yy * w + xx], 0, c.pel_max);
            }
        }
        /* mark TU decoded in the luma-granularity order map */
        int ox = d[2], oy = d[3], ow = d[4], oh = d[5];
        for (int yy = oy >> 2; yy < (oy + oh) >> 2; yy++)
            for (int xx = ox >> 2; xx < (ox + ow) >> 2; xx++)
                c.order_map[(size_t)yy * c.om_w + xx] = i;
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&td_buf);
    PyBuffer_Release(&cm_buf);
    for (int k = 0; k < 3; k++) {
        PyBuffer_Release(&reco_bufs[k]);
        PyBuffer_Release(&coef_bufs[k]);
    }
    PyBuffer_Release(&cum_buf);
    PyBuffer_Release(&cumc_buf);
    PyBuffer_Release(&om_buf);
    PyBuffer_Release(&bank_buf);
    PyBuffer_Release(&off_buf);
    PyBuffer_Release(&lf_buf);
    for (int k = 0; k < 3; k++)
        PyBuffer_Release(&mip_bufs[k]);
    return PyLong_FromLong(i);
}

static PyMethodDef module_methods[] = {
    {"run_from", mod_run_from, METH_VARARGS,
     "Reconstruct eligible TUs from index start; returns first unhandled."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_recon", "Native intra reconstruction engine",
    -1, module_methods, NULL, NULL, NULL, NULL};

PyMODINIT_FUNC PyInit__recon(void) { return PyModule_Create(&moduledef); }
