/* Native motion-compensation block filter.
 *
 * C port of inter_np.mc_block's pixel work (window gather with
 * clamp/wraparound/subpic bounds + separable N-tap FIR with the exact
 * 14-bit intermediate shifts) — parity with vvdec InterpolationFilter
 * (filterHor/filterVer/filterCopy, InterpolationFilter.cpp; IF_INTERNAL_PREC
 * semantics InterpolationFilter.h:65).  Fraction/coefficient selection
 * stays in Python (inter_np.mc_block).
 *
 * #included by cabac.c after walk5.c.
 */

#define IF_PREC 14
#define IF_OFFS (1 << (IF_PREC - 1))
#define IF_FILT 6

/* core: N-tap separable MC over a clamped/wrapped gather window.
 * cx/cy NULL => integer position on that axis.  Returns 0, or -1 with a
 * Python exception set (block too large / OOM). */
static int mc_block_core(const int32_t *ref, int W, int H, int x0, int y0,
                         int w, int h, const int32_t *cx, const int32_t *cy,
                         int taps, int bd, int intermediate, int wrap_off,
                         int lo_x, int lo_y, int hi_x, int hi_y,
                         int32_t *out)
{
    int has_fx = cx != NULL;
    int has_fy = cy != NULL;
    int half = taps / 2 - 1;
    int wx0 = x0 - half, wy0 = y0 - half;
    int ew = w + taps - 1, eh = h + taps - 1;
    int head = IF_PREC - bd;
    if (head < 2) head = 2;
    int pel_max = (1 << bd) - 1;

    /* Interior fast path: the gather window is fully inside the clamp
     * bounds (the overwhelmingly common case away from picture edges),
     * so the index maps collapse to dense pointer runs and the int64
     * accumulators to int32 (worst case for bd<=12: pass-1 |acc| <
     * 2^22, pass-2 |acc| < 2^25 — far inside int32), which lets the
     * compiler vectorize the tap loops (the role of the reference's
     * hand-written SIMD InterpolationFilter backends). */
    if (wrap_off < 0 && bd <= 12
        && wx0 >= lo_x && wx0 + ew - 1 <= hi_x
        && wy0 >= lo_y && wy0 + eh - 1 <= hi_y) {
        const int32_t *base = ref + (size_t)wy0 * W + wx0;
        if (!has_fx && !has_fy) {
            for (int r = 0; r < h; r++) {
                const int32_t *row = base + (size_t)(half + r) * W + half;
                int32_t *o = out + (size_t)r * w;
                if (intermediate) {
                    for (int c = 0; c < w; c++)
                        o[c] = (row[c] << head) - IF_OFFS;
                } else {
                    memcpy(o, row, sizeof(int32_t) * w);
                }
            }
            return 0;
        }
        if (has_fx && has_fy) {
            if (w > 128 || eh > 128 + 16) {
                g_walk_err = "mc_block too large";
                return -1;
            }
            static _Thread_local int32_t tmpd[(128 + 16) * 128];
            int s1 = IF_FILT - head;
            int32_t off1 = -(IF_OFFS << s1);
            int s2 = IF_FILT + head;
            int32_t off2 = (1 << (s2 - 1)) + (IF_OFFS << IF_FILT);
#define MC_PASS1(T)                                                     \
            for (int r = 0; r < eh; r++) {                              \
                const int32_t *row = base + (size_t)r * W;              \
                int32_t *t = tmpd + (size_t)r * w;                      \
                for (int c = 0; c < w; c++) {                           \
                    int32_t acc = 0;                                    \
                    for (int k = 0; k < (T); k++)                       \
                        acc += row[c + k] * cx[k];                      \
                    t[c] = (acc + off1) >> s1;                          \
                }                                                       \
            }
#define MC_PASS2(T)                                                     \
            for (int r = 0; r < h; r++) {                               \
                int32_t *o = out + (size_t)r * w;                       \
                const int32_t *t = tmpd + (size_t)r * w;                \
                if (intermediate) {                                     \
                    for (int c = 0; c < w; c++) {                       \
                        int32_t acc = 0;                                \
                        for (int k = 0; k < (T); k++)                   \
                            acc += t[(size_t)k * w + c] * cy[k];        \
                        o[c] = acc >> IF_FILT;                          \
                    }                                                   \
                } else {                                                \
                    for (int c = 0; c < w; c++) {                       \
                        int32_t acc = 0;                                \
                        for (int k = 0; k < (T); k++)                   \
                            acc += t[(size_t)k * w + c] * cy[k];        \
                        int32_t v = (acc + off2) >> s2;                 \
                        if (v < 0) v = 0;                               \
                        if (v > pel_max) v = pel_max;                   \
                        o[c] = v;                                       \
                    }                                                   \
                }                                                       \
            }
            switch (taps) {
            case 8: MC_PASS1(8) MC_PASS2(8) break;
            case 6: MC_PASS1(6) MC_PASS2(6) break;
            case 4: MC_PASS1(4) MC_PASS2(4) break;
            case 2: MC_PASS1(2) MC_PASS2(2) break;
            default: MC_PASS1(taps) MC_PASS2(taps) break;
            }
#undef MC_PASS1
#undef MC_PASS2
            return 0;
        }
        /* single-direction filter */
        {
            int s = intermediate ? IF_FILT - head : IF_FILT;
            int32_t off = intermediate ? -(IF_OFFS << s)
                                       : (1 << (s - 1));
#define MC_1D(T)                                                        \
            for (int r = 0; r < h; r++) {                               \
                int32_t *o = out + (size_t)r * w;                       \
                if (has_fx) {                                           \
                    const int32_t *row = base + (size_t)(half + r) * W; \
                    for (int c = 0; c < w; c++) {                       \
                        int32_t acc = 0;                                \
                        for (int k = 0; k < (T); k++)                   \
                            acc += row[c + k] * cx[k];                  \
                        int32_t v = (acc + off) >> s;                   \
                        if (!intermediate) {                            \
                            if (v < 0) v = 0;                           \
                            if (v > pel_max) v = pel_max;               \
                        }                                               \
                        o[c] = v;                                       \
                    }                                                   \
                } else {                                                \
                    const int32_t *col = base + (size_t)r * W + half;   \
                    for (int c = 0; c < w; c++) {                       \
                        int32_t acc = 0;                                \
                        for (int k = 0; k < (T); k++)                   \
                            acc += col[(size_t)k * W + c] * cy[k];      \
                        int32_t v = (acc + off) >> s;                   \
                        if (!intermediate) {                            \
                            if (v < 0) v = 0;                           \
                            if (v > pel_max) v = pel_max;               \
                        }                                               \
                        o[c] = v;                                       \
                    }                                                   \
                }                                                       \
            }
            switch (taps) {
            case 8: MC_1D(8) break;
            case 6: MC_1D(6) break;
            case 4: MC_1D(4) break;
            case 2: MC_1D(2) break;
            default: MC_1D(taps) break;
            }
#undef MC_1D
            return 0;
        }
    }

    /* index maps with clamp / wraparound (wrap_cols semantics) */
    int xs_buf[64 + 16], ys_buf[64 + 16];
    int *xs = xs_buf, *ys = ys_buf;
    int xs_heap = 0;
    if (ew > (int)(sizeof(xs_buf) / sizeof(int))
        || eh > (int)(sizeof(ys_buf) / sizeof(int))) {
        xs = (int *)malloc(sizeof(int) * (ew + eh));
        if (!xs) {
            PyErr_NoMemory();
            return -1;
        }
        ys = xs + ew;
        xs_heap = 1;
    }
    for (int i = 0; i < ew; i++) {
        int v = wx0 + i;
        if (wrap_off >= 0) {
            int o = v < 0 ? 0 : (v > W - 1 ? W - 1 : v);
            if (v < 0)
                o = v >= -wrap_off ? v + wrap_off : 0;
            else if (v >= W)
                o = v < W + wrap_off ? v - wrap_off : W - 1;
            v = o;
        } else {
            if (v < lo_x) v = lo_x;
            if (v > hi_x) v = hi_x;
        }
        xs[i] = v;
    }
    for (int i = 0; i < eh; i++) {
        int v = wy0 + i;
        if (v < lo_y) v = lo_y;
        if (v > hi_y) v = hi_y;
        ys[i] = v;
    }

    if (!has_fx && !has_fy) {
        for (int r = 0; r < h; r++) {
            const int32_t *row = ref + (size_t)ys[half + r] * W;
            int32_t *o = out + (size_t)r * w;
            if (intermediate) {
                for (int c = 0; c < w; c++)
                    o[c] = (row[xs[half + c]] << head) - IF_OFFS;
            } else {
                for (int c = 0; c < w; c++)
                    o[c] = row[xs[half + c]];
            }
        }
    } else if (has_fx && has_fy) {
        /* pass 1 horizontal over the full vertical extent */
        static _Thread_local int32_t tmp[(128 + 16) * 128]; /* [eh][w] */
        if (w > 128 || eh > 128 + 16) {
            if (xs_heap) free(xs);
            g_walk_err = "mc_block too large";
            return -1;
        }
        int s1 = IF_FILT - head;
        int64_t off1 = -((int64_t)IF_OFFS << s1);
        for (int r = 0; r < eh; r++) {
            const int32_t *row = ref + (size_t)ys[r] * W;
            int32_t *t = tmp + (size_t)r * w;
            for (int c = 0; c < w; c++) {
                int64_t acc = 0;
                for (int k = 0; k < taps; k++)
                    acc += (int64_t)row[xs[c + k]] * cx[k];
                t[c] = (int32_t)((acc + off1) >> s1);
            }
        }
        for (int r = 0; r < h; r++) {
            int32_t *o = out + (size_t)r * w;
            for (int c = 0; c < w; c++) {
                int64_t acc = 0;
                for (int k = 0; k < taps; k++)
                    acc += (int64_t)tmp[(size_t)(r + k) * w + c] * cy[k];
                if (intermediate) {
                    o[c] = (int32_t)(acc >> IF_FILT);
                } else {
                    int s2 = IF_FILT + head;
                    int64_t off2 = ((int64_t)1 << (s2 - 1))
                                   + ((int64_t)IF_OFFS << IF_FILT);
                    int64_t v = (acc + off2) >> s2;
                    if (v < 0) v = 0;
                    if (v > pel_max) v = pel_max;
                    o[c] = (int32_t)v;
                }
            }
        }
    } else {
        int s = intermediate ? IF_FILT - head : IF_FILT;
        int64_t off = intermediate ? -((int64_t)IF_OFFS << s)
                                   : ((int64_t)1 << (s - 1));
        for (int r = 0; r < h; r++) {
            int32_t *o = out + (size_t)r * w;
            for (int c = 0; c < w; c++) {
                int64_t acc = 0;
                if (has_fx) {
                    const int32_t *row = ref + (size_t)ys[half + r] * W;
                    for (int k = 0; k < taps; k++)
                        acc += (int64_t)row[xs[c + k]] * cx[k];
                } else {
                    for (int k = 0; k < taps; k++)
                        acc += (int64_t)ref[(size_t)ys[r + k] * W
                                            + xs[half + c]] * cy[k];
                }
                int64_t v = (acc + off) >> s;
                if (!intermediate) {
                    if (v < 0) v = 0;
                    if (v > pel_max) v = pel_max;
                }
                o[c] = (int32_t)v;
            }
        }
    }

    if (xs_heap) free(xs);
    return 0;
}

/* mc_block(ref y* i32, W, H, x0 (incl. int mv), y0, w, h,
 *   cx y* i32[taps] or b"", cy y* i32[taps] or b"", taps, bd,
 *   intermediate, wrap_off(-1 none), lo_x, lo_y, hi_x, hi_y, out w* i32) */
static PyObject *mod_mc_block(PyObject *self, PyObject *args)
{
    Py_buffer b_ref, b_cx, b_cy, b_out;
    int W, H, x0, y0, w, h, taps, bd, intermediate, wrap_off;
    int lo_x, lo_y, hi_x, hi_y;
    if (!PyArg_ParseTuple(args, "y*iiiiiiy*y*iiiiiiiiw*",
                          &b_ref, &W, &H, &x0, &y0, &w, &h, &b_cx, &b_cy,
                          &taps, &bd, &intermediate, &wrap_off, &lo_x, &lo_y,
                          &hi_x, &hi_y, &b_out))
        return NULL;
    int has_fx = b_cx.len >= (Py_ssize_t)sizeof(int32_t);
    int has_fy = b_cy.len >= (Py_ssize_t)sizeof(int32_t);
    int rc = mc_block_core(
        (const int32_t *)b_ref.buf, W, H, x0, y0, w, h,
        has_fx ? (const int32_t *)b_cx.buf : NULL,
        has_fy ? (const int32_t *)b_cy.buf : NULL,
        taps, bd, intermediate, wrap_off, lo_x, lo_y, hi_x, hi_y,
        (int32_t *)b_out.buf);
    PyBuffer_Release(&b_ref);
    PyBuffer_Release(&b_cx);
    PyBuffer_Release(&b_cy);
    PyBuffer_Release(&b_out);
    if (rc < 0)
        return NULL;
    Py_RETURN_NONE;
}
