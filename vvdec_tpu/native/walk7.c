/* Standalone per-TU dequant + separable inverse transform.
 *
 * C port of recon_np.dequant_block + inverse_transform (parity:
 * Quant::dequant Quant.cpp:292 incl. explicit scaling lists :338,
 * TrQuant_EMT fastInverse cores) for the generic per-TU reconstruction
 * path (inter frames, TUs outside the intra fast set).  Transform-skip,
 * BDPCM and LFNST TUs stay on the Python path.
 *
 * #included by cabac.c after walk6.c.
 */

#define ITX_MAX_TR_RANGE 15
#define ITX_CLIP_MIN (-(1 << ITX_MAX_TR_RANGE))
#define ITX_CLIP_MAX ((1 << ITX_MAX_TR_RANGE) - 1)

static const int ITX_INV_QUANT_SCALES[2][6] = {
    {40, 45, 51, 57, 64, 72},
    {57, 64, 72, 80, 90, 102},
};

static inline int64_t itx_clip(int64_t v, int64_t lo, int64_t hi)
{
    return v < lo ? lo : (v > hi ? hi : v);
}

/* core: dequant + separable inverse transform of one TU (w, h >= 2).
 * out: int64 [h][w]. */
static void itx_block_core(const int32_t *coef, int W, int x, int y, int w,
                           int h, int qp, int dep_quant, int max_x,
                           int max_y, int bd, const int32_t *mh,
                           const int32_t *mv, const int32_t *scale_mat,
                           int64_t *out)
{
    int log2w = w_ilog2(w), log2h = w_ilog2(h);
    int transform_shift = ITX_MAX_TR_RANGE - bd - ((log2w + log2h) >> 1);
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
    int64_t scale0 = ITX_INV_QUANT_SCALES[needs_sqrt2 ? 1 : 0][qp_rem];
    if (scale_mat)
        right_shift += 4; /* LOG2_SCALING_LIST_NEUTRAL_VALUE */
    int target_bd = 64 + right_shift - 7;
    if (target_bd > ITX_MAX_TR_RANGE + 1) target_bd = ITX_MAX_TR_RANGE + 1;
    int64_t input_max = ((int64_t)1 << (target_bd - 1)) - 1;

    /* coefficients clip to the 16-bit transform range -> the transform
     * passes fit int32 (|acc| <= 64 * 2^15 * 2^7 = 2^28); accumulate per
     * nonzero coefficient with contiguous inner loops */
    static _Thread_local int32_t deq[64 * 64];
    memset(deq, 0, sizeof(int32_t) * (size_t)w * h);
    for (int yy = 0; yy <= max_y; yy++) {
        for (int xx = 0; xx <= max_x; xx++) {
            int64_t lv = coef[(size_t)(y + yy) * W + (x + xx)];
            if (lv == 0) continue;
            int64_t sc = scale_mat
                             ? scale0 * scale_mat[(size_t)yy * w + xx]
                             : scale0;
            int64_t cl = itx_clip(lv, -input_max - 1, input_max);
            int64_t d;
            if (right_shift > 0)
                d = (cl * sc + ((int64_t)1 << (right_shift - 1)))
                    >> right_shift;
            else
                d = (cl * sc) << (-right_shift);
            deq[(size_t)yy * w + xx] = (int32_t)itx_clip(d, ITX_CLIP_MIN,
                                                         ITX_CLIP_MAX);
        }
    }

    int s1 = 7;
    int s2 = (6 + ITX_MAX_TR_RANGE - 1) - bd;
    static _Thread_local int32_t t[64 * 64];
    int kmax = max_y + 1;
    int xmax = max_x + 1;
    for (int xx = 0; xx < xmax; xx++) {
        int32_t acc[64];
        memset(acc, 0, sizeof(int32_t) * h);
        for (int k = 0; k < kmax; k++) {
            int32_t cv = deq[(size_t)k * w + xx];
            if (cv == 0) continue;
            const int32_t *mvr = mv + (size_t)k * h;
            for (int j = 0; j < h; j++)
                acc[j] += cv * mvr[j];
        }
        int32_t *tc = t + (size_t)xx * h;
        for (int j = 0; j < h; j++) {
            int32_t v = (acc[j] + (1 << (s1 - 1))) >> s1;
            if (v < ITX_CLIP_MIN) v = ITX_CLIP_MIN;
            if (v > ITX_CLIP_MAX) v = ITX_CLIP_MAX;
            tc[j] = v;
        }
    }
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
        int64_t *rr = out + (size_t)j * w;
        for (int xp = 0; xp < w; xp++) {
            int32_t v = (acc[xp] + (1 << (s2 - 1))) >> s2;
            if (v < ITX_CLIP_MIN) v = ITX_CLIP_MIN;
            if (v > ITX_CLIP_MAX) v = ITX_CLIP_MAX;
            rr[xp] = v;
        }
    }
}

/* itx_block(coef y* i32 plane, W, x, y, w, h, qp, dep_quant, max_x, max_y,
 *   bd, mh y* i32[w*w], mv y* i32[h*h], scale y* i32[h*w] or b"",
 *   out w* i64[h*w]) */
static PyObject *mod_itx_block(PyObject *self, PyObject *args)
{
    Py_buffer b_coef, b_mh, b_mv, b_scale, b_out;
    int W, x, y, w, h, qp, dep_quant, max_x, max_y, bd;
    if (!PyArg_ParseTuple(args, "y*iiiiiiiiiiy*y*y*w*",
                          &b_coef, &W, &x, &y, &w, &h, &qp, &dep_quant,
                          &max_x, &max_y, &bd, &b_mh, &b_mv, &b_scale,
                          &b_out))
        return NULL;
    itx_block_core((const int32_t *)b_coef.buf, W, x, y, w, h, qp,
                   dep_quant, max_x, max_y, bd,
                   (const int32_t *)b_mh.buf, (const int32_t *)b_mv.buf,
                   b_scale.len >= (Py_ssize_t)sizeof(int32_t)
                       ? (const int32_t *)b_scale.buf : NULL,
                   (int64_t *)b_out.buf);
    PyBuffer_Release(&b_coef);
    PyBuffer_Release(&b_mh);
    PyBuffer_Release(&b_mv);
    PyBuffer_Release(&b_scale);
    PyBuffer_Release(&b_out);
    Py_RETURN_NONE;
}
