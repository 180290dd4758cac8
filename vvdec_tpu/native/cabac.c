/* Native CABAC arithmetic decoder for the host parse plane.
 *
 * Semantics are bit-identical to vvdec_tpu/cabac/engine.py (the pure-Python
 * reference implementation), which itself mirrors the H.266 clause 9.3
 * decoding process / vvdec BinDecoder (BinDecoder.cpp:81-384) with the
 * two-window adaptive probability model (Contexts.h:71-150).
 *
 * The decoder owns the 372-context probability state; WPP/tile context
 * save/restore goes through ctx_save()/ctx_load() byte snapshots.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <stdint.h>
#include <string.h>

static const uint8_t RENORM_TABLE_32[32] = {
    6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
};

#define MASK_0 0x7FE0 /* bits 5..14 */
#define MASK_1 0x7FFE /* bits 1..14 */

typedef struct {
    PyObject_HEAD
    PyObject *data_obj; /* bytes object kept alive */
    const uint8_t *data;
    Py_ssize_t len;
    Py_ssize_t pos, end;
    int64_t range_, value_;
    int32_t bits_needed;
    int32_t num_ctx;
    /* per-context probability state packed into one 16-byte record
     * (s0, s1, d0, d1, r0, r1, pad, pad as int16) so a bin decode
     * touches ONE cache line instead of six parallel arrays */
    int16_t *cm;
    /* cached init tables (B, P, I) + rates, each num_ctx bytes */
    uint8_t *init_tables[3];
    uint8_t *rates_tab;
} Decoder;

static inline int read_byte(Decoder *d)
{
    if (d->pos >= d->end) {
        d->pos += 1;
        return 0;
    }
    return d->data[d->pos++];
}

static void Decoder_dealloc(Decoder *self)
{
    Py_XDECREF(self->data_obj);
    free(self->cm);
    for (int i = 0; i < 3; i++) free(self->init_tables[i]);
    free(self->rates_tab);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static int Decoder_init(Decoder *self, PyObject *args, PyObject *kw)
{
    PyObject *data;
    Py_ssize_t start = 0;
    PyObject *end_obj = Py_None;
    int num_ctx;
    PyObject *init_b, *init_p, *init_i, *rates;
    static char *kwlist[] = {"data", "start_byte", "end_byte", "num_ctx",
                             "init_b", "init_p", "init_i", "rates", NULL};
    if (!PyArg_ParseTupleAndKeywords(
            args, kw, "O|nOiSSSS", kwlist, &data, &start, &end_obj, &num_ctx,
            &init_b, &init_p, &init_i, &rates))
        return -1;
    if (!PyBytes_Check(data)) {
        PyErr_SetString(PyExc_TypeError, "data must be bytes");
        return -1;
    }
    Py_INCREF(data);
    self->data_obj = data;
    self->data = (const uint8_t *)PyBytes_AS_STRING(data);
    self->len = PyBytes_GET_SIZE(data);
    self->pos = start;
    self->end = (end_obj == Py_None) ? self->len : PyLong_AsSsize_t(end_obj);
    self->num_ctx = num_ctx;
    self->cm = (int16_t *)calloc((size_t)num_ctx * 8, sizeof(int16_t));
    if (!self->cm) {
        PyErr_NoMemory();
        return -1;
    }
    PyObject *tabs[3] = {init_b, init_p, init_i};
    for (int i = 0; i < 3; i++) {
        if (PyBytes_GET_SIZE(tabs[i]) != num_ctx) {
            PyErr_SetString(PyExc_ValueError, "init table size mismatch");
            return -1;
        }
        self->init_tables[i] = (uint8_t *)malloc(num_ctx);
        memcpy(self->init_tables[i], PyBytes_AS_STRING(tabs[i]), num_ctx);
    }
    self->rates_tab = (uint8_t *)malloc(num_ctx);
    memcpy(self->rates_tab, PyBytes_AS_STRING(rates), num_ctx);
    self->range_ = 510;
    self->value_ = 0;
    self->bits_needed = -8;
    return 0;
}

static PyObject *Decoder_ctx_init(Decoder *self, PyObject *args)
{
    int qp, init_id;
    if (!PyArg_ParseTuple(args, "ii", &qp, &init_id))
        return NULL;
    if (qp < 0) qp = 0;
    if (qp > 63) qp = 63;
    const uint8_t *init = self->init_tables[init_id];
    const uint8_t *rates = self->rates_tab;
    for (int i = 0; i < self->num_ctx; i++) {
        int32_t slope = (init[i] >> 3) - 4;
        int32_t offset = (init[i] & 7) * 18 + 1;
        int32_t inistate = ((slope * (qp - 16)) >> 1) + offset;
        if (inistate < 1) inistate = 1;
        if (inistate > 127) inistate = 127;
        int32_t p1 = inistate << 8;
        int16_t *c = self->cm + (size_t)i * 8;
        int32_t r0 = 2 + ((rates[i] >> 2) & 3);
        int32_t r1 = 3 + r0 + (rates[i] & 3);
        c[0] = (int16_t)(p1 & MASK_0);       /* s0 */
        c[1] = (int16_t)(p1 & MASK_1);       /* s1 */
        c[4] = (int16_t)(r0 + 5);            /* rate0 */
        c[5] = (int16_t)(r1 + 1);            /* rate1 */
        c[2] = (int16_t)(0xFFFF >> (16 - c[4])); /* d00 */
        c[3] = (int16_t)(0xFFFF >> (16 - c[5])); /* d10 */
    }
    Py_RETURN_NONE;
}

static PyObject *Decoder_start(Decoder *self, PyObject *Py_UNUSED(ign))
{
    self->range_ = 510;
    self->value_ = (read_byte(self) << 8) + read_byte(self);
    self->bits_needed = -8;
    Py_RETURN_NONE;
}

static PyObject *Decoder_restart(Decoder *self, PyObject *args)
{
    Py_ssize_t start;
    PyObject *end_obj = Py_None;
    if (!PyArg_ParseTuple(args, "n|O", &start, &end_obj))
        return NULL;
    self->pos = start;
    self->end = (end_obj == Py_None) ? self->len : PyLong_AsSsize_t(end_obj);
    self->range_ = 510;
    self->value_ = (read_byte(self) << 8) + read_byte(self);
    self->bits_needed = -8;
    Py_RETURN_NONE;
}

static inline int dec_bin(Decoder *d, int ctx)
{
    int64_t rng = d->range_;
    int64_t value = d->value_;
    int16_t *cm = d->cm + (size_t)ctx * 8;
    int32_t q = (cm[0] + cm[1]) >> 8;
    int bin_val = q >> 7;
    int32_t qs = bin_val ? (q ^ 0xFF) : q;
    int64_t lps = (((int64_t)(qs >> 2) * (rng >> 5)) >> 1) + 4;
    rng -= lps;
    int64_t sr = rng << 7;
    if (value >= sr) {
        bin_val ^= 1;
        int nb = RENORM_TABLE_32[lps >> 3];
        value = (value - sr) << nb;
        rng = lps << nb;
        d->bits_needed += nb;
    } else if (rng < 256) {
        value <<= 1;
        rng <<= 1;
        d->bits_needed += 1;
    }
    if (d->bits_needed >= 0) {
        value += (int64_t)read_byte(d) << d->bits_needed;
        d->bits_needed -= 8;
    }
    d->range_ = rng;
    d->value_ = value;
    /* two-window probability update */
    int32_t s0 = cm[0], s1 = cm[1];
    int32_t d0 = bin_val ? 0x7FFF : cm[2];
    int32_t d1 = bin_val ? 0x7FFF : cm[3];
    cm[0] = (int16_t)(s0 + ((d0 - s0) >> cm[4]) * 32);
    cm[1] = (int16_t)(s1 + ((d1 - s1) >> cm[5]) * 2);
    return bin_val;
}

static inline int dec_bin_ep(Decoder *d)
{
    int64_t value = d->value_ << 1;
    d->bits_needed += 1;
    if (d->bits_needed >= 0) {
        value += read_byte(d);
        d->bits_needed = -8;
    }
    int64_t sr = d->range_ << 7;
    int bin_val = 0;
    if (value >= sr) {
        value -= sr;
        bin_val = 1;
    }
    d->value_ = value;
    return bin_val;
}

static inline uint32_t dec_aligned_bins_ep(Decoder *d, int num_bins)
{
    int rem = num_bins;
    uint32_t bins = 0;
    while (rem > 0) {
        int n = rem < 8 ? rem : 8;
        uint32_t mask = (1u << n) - 1;
        uint32_t nb = ((uint32_t)(d->value_ >> (15 - n))) & mask;
        bins = (bins << n) | nb;
        d->value_ = (d->value_ << n) & 0x7FFF;
        rem -= n;
        d->bits_needed += n;
        if (d->bits_needed >= 0) {
            d->value_ |= (int64_t)read_byte(d) << d->bits_needed;
            d->bits_needed -= 8;
        }
    }
    return bins;
}

static inline uint32_t dec_bins_ep(Decoder *d, int num_bins)
{
    if (num_bins == 0) return 0;
    if (d->range_ == 256)
        return dec_aligned_bins_ep(d, num_bins);
    int rem = num_bins;
    uint32_t bins = 0;
    int64_t value = d->value_;
    int64_t rng = d->range_;
    int bits_needed = d->bits_needed;
    while (rem > 8) {
        value = (value << 8) + ((int64_t)read_byte(d) << (8 + bits_needed));
        int64_t sr = rng << 15;
        for (int k = 0; k < 8; k++) {
            bins += bins;
            sr >>= 1;
            if (value >= sr) {
                bins += 1;
                value -= sr;
            }
        }
        rem -= 8;
    }
    bits_needed += rem;
    value <<= rem;
    if (bits_needed >= 0) {
        value += (int64_t)read_byte(d) << bits_needed;
        bits_needed -= 8;
    }
    int64_t sr = rng << (rem + 7);
    for (int k = 0; k < rem; k++) {
        bins += bins;
        sr >>= 1;
        if (value >= sr) {
            bins += 1;
            value -= sr;
        }
    }
    d->value_ = value;
    d->range_ = rng;
    d->bits_needed = bits_needed;
    return bins;
}

/* ------------------------------------------------------------------ */
/* Register-resident engine state for the hot residual-coding loops:   */
/* the same arithmetic decoder, but range/value/bits/pos live in a     */
/* local struct the compiler keeps in registers across thousands of    */
/* bins, instead of bouncing through the Decoder object per bin.       */
/* Semantics identical to dec_bin/dec_bin_ep/dec_bins_ep/dec_rem_abs.  */
typedef struct {
    int64_t range_, value_;
    int32_t bits_needed;
    Py_ssize_t pos, end;
    const uint8_t *data;
} EngSt;

static inline void eng_load(EngSt *e, const Decoder *d)
{
    e->range_ = d->range_;
    e->value_ = d->value_;
    e->bits_needed = d->bits_needed;
    e->pos = d->pos;
    e->end = d->end;
    e->data = d->data;
}

static inline void eng_store(Decoder *d, const EngSt *e)
{
    d->range_ = e->range_;
    d->value_ = e->value_;
    d->bits_needed = e->bits_needed;
    d->pos = e->pos;
}

static inline int e_read_byte(EngSt *e)
{
    if (e->pos >= e->end) {
        e->pos += 1;
        return 0;
    }
    return e->data[e->pos++];
}

static inline int e_dec_bin(EngSt *e, int16_t *cm)
{
    int64_t rng = e->range_;
    int64_t value = e->value_;
    int32_t q = (cm[0] + cm[1]) >> 8;
    int bin_val = q >> 7;
    int32_t qs = bin_val ? (q ^ 0xFF) : q;
    int64_t lps = (((int64_t)(qs >> 2) * (rng >> 5)) >> 1) + 4;
    rng -= lps;
    int64_t sr = rng << 7;
    if (value >= sr) {
        bin_val ^= 1;
        int nb = RENORM_TABLE_32[lps >> 3];
        value = (value - sr) << nb;
        rng = lps << nb;
        e->bits_needed += nb;
    } else if (rng < 256) {
        value <<= 1;
        rng <<= 1;
        e->bits_needed += 1;
    }
    if (e->bits_needed >= 0) {
        value += (int64_t)e_read_byte(e) << e->bits_needed;
        e->bits_needed -= 8;
    }
    e->range_ = rng;
    e->value_ = value;
    int32_t s0 = cm[0], s1 = cm[1];
    int32_t d0 = bin_val ? 0x7FFF : cm[2];
    int32_t d1 = bin_val ? 0x7FFF : cm[3];
    cm[0] = (int16_t)(s0 + ((d0 - s0) >> cm[4]) * 32);
    cm[1] = (int16_t)(s1 + ((d1 - s1) >> cm[5]) * 2);
    return bin_val;
}

static inline int e_dec_bin_ep(EngSt *e)
{
    int64_t value = e->value_ << 1;
    e->bits_needed += 1;
    if (e->bits_needed >= 0) {
        value += e_read_byte(e);
        e->bits_needed = -8;
    }
    int64_t sr = e->range_ << 7;
    int bin_val = 0;
    if (value >= sr) {
        value -= sr;
        bin_val = 1;
    }
    e->value_ = value;
    return bin_val;
}

static inline uint32_t e_dec_aligned_bins_ep(EngSt *e, int num_bins)
{
    int rem = num_bins;
    uint32_t bins = 0;
    while (rem > 0) {
        int n = rem < 8 ? rem : 8;
        uint32_t mask = (1u << n) - 1;
        uint32_t nb = ((uint32_t)(e->value_ >> (15 - n))) & mask;
        bins = (bins << n) | nb;
        e->value_ = (e->value_ << n) & 0x7FFF;
        rem -= n;
        e->bits_needed += n;
        if (e->bits_needed >= 0) {
            e->value_ |= (int64_t)e_read_byte(e) << e->bits_needed;
            e->bits_needed -= 8;
        }
    }
    return bins;
}

static inline uint32_t e_dec_bins_ep(EngSt *e, int num_bins)
{
    if (num_bins == 0) return 0;
    if (e->range_ == 256)
        return e_dec_aligned_bins_ep(e, num_bins);
    int rem = num_bins;
    uint32_t bins = 0;
    int64_t value = e->value_;
    int64_t rng = e->range_;
    int bits_needed = e->bits_needed;
    while (rem > 8) {
        value = (value << 8) + ((int64_t)e_read_byte(e) << (8 + bits_needed));
        int64_t sr = rng << 15;
        for (int k = 0; k < 8; k++) {
            bins += bins;
            sr >>= 1;
            if (value >= sr) {
                bins += 1;
                value -= sr;
            }
        }
        rem -= 8;
    }
    bits_needed += rem;
    value <<= rem;
    if (bits_needed >= 0) {
        value += (int64_t)e_read_byte(e) << bits_needed;
        bits_needed -= 8;
    }
    int64_t sr = rng << (rem + 7);
    for (int k = 0; k < rem; k++) {
        bins += bins;
        sr >>= 1;
        if (value >= sr) {
            bins += 1;
            value -= sr;
        }
    }
    e->value_ = value;
    e->range_ = rng;
    e->bits_needed = bits_needed;
    return bins;
}

static inline int e_dec_rem_abs(EngSt *e, int rice, int cutoff, int maxlog2)
{
    int max_prefix = 32 - maxlog2;
    int prefix = 0, code = 0;
    for (;;) {
        prefix += 1;
        code = e_dec_bin_ep(e);
        if (!(code && prefix < max_prefix))
            break;
    }
    prefix -= 1 - code;
    int length = rice;
    uint32_t offset;
    if (prefix < cutoff) {
        offset = (uint32_t)prefix << rice;
    } else {
        offset = (uint32_t)(((1u << (prefix - cutoff)) + cutoff - 1) << rice);
        length += (prefix == max_prefix) ? (maxlog2 - rice) : (prefix - cutoff);
    }
    return (int)(offset + e_dec_bins_ep(e, length));
}

static inline int e_last_prefix(EngSt *e, Decoder *d, int ctx_base,
                                int shift, int max_val)
{
    int pos = 0;
    while (pos < max_val
           && e_dec_bin(e, d->cm + (size_t)(ctx_base + (pos >> shift)) * 8))
        pos += 1;
    return pos;
}

static PyObject *Decoder_decode_bin(Decoder *self, PyObject *arg)
{
    long ctx = PyLong_AsLong(arg);
    if (ctx < 0 || ctx >= self->num_ctx) {
        if (PyErr_Occurred()) return NULL;
        PyErr_SetString(PyExc_IndexError, "ctx id out of range");
        return NULL;
    }
    return PyLong_FromLong(dec_bin(self, (int)ctx));
}

static PyObject *Decoder_decode_bin_ep(Decoder *self, PyObject *Py_UNUSED(i))
{
    return PyLong_FromLong(dec_bin_ep(self));
}

static PyObject *Decoder_decode_bins_ep(Decoder *self, PyObject *arg)
{
    long n = PyLong_AsLong(arg);
    if (n < 0) return NULL;
    return PyLong_FromUnsignedLong(dec_bins_ep(self, (int)n));
}

static PyObject *Decoder_decode_rem_abs_ep(Decoder *self, PyObject *args)
{
    int rice, cutoff, max_log2_dyn;
    if (!PyArg_ParseTuple(args, "iii", &rice, &cutoff, &max_log2_dyn))
        return NULL;
    int max_prefix = 32 - max_log2_dyn;
    int prefix = 0, code = 0;
    for (;;) {
        prefix += 1;
        code = dec_bin_ep(self);
        if (!(code && prefix < max_prefix))
            break;
    }
    prefix -= 1 - code;
    int length = rice;
    uint32_t offset;
    if (prefix < cutoff) {
        offset = (uint32_t)prefix << rice;
    } else {
        offset = (uint32_t)(((1u << (prefix - cutoff)) + cutoff - 1) << rice);
        length += (prefix == max_prefix) ? (max_log2_dyn - rice)
                                         : (prefix - cutoff);
    }
    return PyLong_FromUnsignedLong(offset + dec_bins_ep(self, length));
}

static PyObject *Decoder_decode_bin_trm(Decoder *self, PyObject *Py_UNUSED(i))
{
    self->range_ -= 2;
    int64_t sr = self->range_ << 7;
    if (self->value_ >= sr)
        return PyLong_FromLong(1);
    if (self->range_ < 256) {
        self->range_ += self->range_;
        self->value_ += self->value_;
        self->bits_needed += 1;
        if (self->bits_needed == 0) {
            self->value_ += read_byte(self);
            self->bits_needed = -8;
        }
    }
    return PyLong_FromLong(0);
}

static PyObject *Decoder_align(Decoder *self, PyObject *Py_UNUSED(ignored))
{
    self->range_ = 256;
    Py_RETURN_NONE;
}

static PyObject *Decoder_finish_ok(Decoder *self, PyObject *Py_UNUSED(i))
{
    int prev = 0;
    if (self->pos > 0 && self->pos <= self->len)
        prev = self->data[self->pos - 1];
    return PyBool_FromLong(((prev << (8 + self->bits_needed)) & 0xFF) == 0x80);
}

static PyObject *Decoder_ctx_save(Decoder *self, PyObject *Py_UNUSED(i))
{
    return PyBytes_FromStringAndSize(
        (const char *)self->cm,
        (Py_ssize_t)self->num_ctx * 8 * sizeof(int16_t));
}

static PyObject *Decoder_ctx_load(Decoder *self, PyObject *arg)
{
    Py_buffer view;
    if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0)
        return NULL;
    if (view.len !=
        (Py_ssize_t)self->num_ctx * 8 * (Py_ssize_t)sizeof(int16_t)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "ctx snapshot size mismatch");
        return NULL;
    }
    memcpy(self->cm, view.buf, view.len);
    PyBuffer_Release(&view);
    Py_RETURN_NONE;
}

/* ------------------------------------------------------------------ */
/* residual coding (regular path) — port of                             */
/* CtuDecoder.residual_coding (vvdec_tpu/cabac/ctu_decoder.py), itself */
/* parity with CABACReader::residual_coding (CABACReader.cpp).          */
/* ------------------------------------------------------------------ */

/* g_uiGroupIdx / g_uiMinInGroup / g_auiGoRiceParsCoeff (Rom.cpp) */
static const int8_t GROUP_IDX_T[64] = {
    0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
    8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9,
    10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10,
    11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11,
};
static const int8_t MIN_IN_GROUP_T[14] = {0, 1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96};
static const int8_t GO_RICE_PARS_T[32] = {
    0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3,
};
#define COEF_REMAIN_BIN_REDUCTION 5
#define SBH_THRESHOLD 4

static inline int dec_rem_abs(Decoder *d, int rice, int cutoff, int maxlog2)
{
    int max_prefix = 32 - maxlog2;
    int prefix = 0, code = 0;
    for (;;) {
        prefix += 1;
        code = dec_bin_ep(d);
        if (!(code && prefix < max_prefix))
            break;
    }
    prefix -= 1 - code;
    int length = rice;
    uint32_t offset;
    if (prefix < cutoff) {
        offset = (uint32_t)prefix << rice;
    } else {
        offset = (uint32_t)(((1u << (prefix - cutoff)) + cutoff - 1) << rice);
        length += (prefix == max_prefix) ? (maxlog2 - rice) : (prefix - cutoff);
    }
    return (int)(offset + dec_bins_ep(d, length));
}

static inline int tmpl_abs_sum(int blk_pos, const int32_t *coeff, int w,
                               int h, int log2_w, int base_level)
{
    int py = blk_pos >> log2_w;
    int px = blk_pos & (w - 1);
    int s = 0;
    if (px + 2 < w) {
        s += coeff[blk_pos + 1] + coeff[blk_pos + 2];
        if (py + 1 < h) s += coeff[blk_pos + w + 1];
    } else if (px + 1 < w) {
        s += coeff[blk_pos + 1];
        if (py + 1 < h) s += coeff[blk_pos + w + 1];
    }
    if (py + 2 < h) {
        s += coeff[blk_pos + w] + coeff[blk_pos + 2 * w];
    } else if (py + 1 < h) {
        s += coeff[blk_pos + w];
    }
    s -= 5 * base_level;
    if (s < 0) s = 0;
    if (s > 31) s = 31;
    return s;
}

static inline int last_prefix(Decoder *d, int ctx_base, int shift, int max_val)
{
    int pos = 0;
    while (pos < max_val && dec_bin(d, ctx_base + (pos >> shift)))
        pos += 1;
    return pos;
}

static PyObject *Decoder_decode_residual(Decoder *self, PyObject *args)
{
    int w, h, ch, lg_cw, lg_ch;
    int last_ctx_x, last_ctx_y, last_shift_x, last_shift_y;
    int max_last_x, max_last_y;
    int sig_b0, sig_b1, sig_b2, par_b, gt1_b, gt2_b, sig_grp_b;
    long long state_trans;
    int sign_hiding, bdpcm, max_log2_tr;
    int dep_quant_out, skip_pre;
    Py_buffer scan_buf, scan_cg_buf, out_buf;
    if (!PyArg_ParseTuple(
            args, "iiiiiiiiiiiiiiiiiiLiiiiiy*y*w*", &w, &h, &ch, &lg_cw,
            &lg_ch, &last_ctx_x, &last_ctx_y, &last_shift_x, &last_shift_y,
            &max_last_x, &max_last_y, &sig_b0, &sig_b1, &sig_b2, &par_b,
            &gt1_b, &gt2_b, &sig_grp_b, &state_trans, &sign_hiding, &bdpcm,
            &max_log2_tr, &dep_quant_out, &skip_pre, &scan_buf, &scan_cg_buf,
            &out_buf))
        return NULL;
    const int32_t *scan = (const int32_t *)scan_buf.buf;
    const int32_t *scan_cg = (const int32_t *)scan_cg_buf.buf;
    int32_t *out = (int32_t *)out_buf.buf; /* w*h final signed coeffs */
    int log2_w = 0;
    while ((1 << log2_w) < w) log2_w++;
    int log2_cg = lg_cw + lg_ch;
    int w_clip = w < 32 ? w : 32, h_clip = h < 32 ? h : 32;
    int w_groups = w_clip >> lg_cw;
    int h_groups = h_clip >> lg_ch;
    int max_num_coeff = w * h;

    /* ---- last significant position ---- */
    int pos_x = last_prefix(self, last_ctx_x, last_shift_x, max_last_x);
    int pos_y = last_prefix(self, last_ctx_y, last_shift_y, max_last_y);
    if (pos_x > 3) {
        int n = (pos_x - 2) >> 1, t = 0;
        for (int i = n - 1; i >= 0; i--)
            t += dec_bin_ep(self) << i;
        pos_x = MIN_IN_GROUP_T[pos_x] + t;
    }
    if (pos_y > 3) {
        int n = (pos_y - 2) >> 1, t = 0;
        for (int i = n - 1; i >= 0; i--)
            t += dec_bin_ep(self) << i;
        pos_y = MIN_IN_GROUP_T[pos_y] + t;
    }
    int blk_last = pos_x + pos_y * w;
    int n_scan = (w_groups * h_groups) << log2_cg;
    int scan_pos_last = max_num_coeff - 1;
    for (int i = 0; i < n_scan; i++) {
        if (scan[i] == blk_last) {
            scan_pos_last = i;
            break;
        }
    }

    static _Thread_local int32_t coeff_abs[64 * 64];
    static _Thread_local int32_t tpl[64 * 64];
    memset(coeff_abs, 0, sizeof(int32_t) * max_num_coeff);
    memset(tpl, 0, sizeof(int32_t) * max_num_coeff);
    memset(out, 0, sizeof(int32_t) * max_num_coeff);
    /* per-CG bookkeeping for the final sign/dep-quant pass */
    static _Thread_local int32_t sub_positions[4096];
    static _Thread_local int32_t sub_meta[1024][4]; /* nnz, sign_pattern, sub1_pattern, pos_off */
    int n_subsets_out = 0, pos_fill = 0;

    uint8_t sig_cg[1024 + 64 + 1];
    memset(sig_cg, 0, (size_t)(w_groups * h_groups + w_groups + 1));
    int state = 0;
    int reg_bin_limit = ((w_clip * h_clip) * 28) >> 4;
    int max_cg_x = 0, max_cg_y = 0;
    const int sig_base[3] = {sig_b0, sig_b1, sig_b2};

    for (int subset_id = scan_pos_last >> log2_cg; subset_id >= 0; subset_id--) {
        int cg_pos = scan_cg[subset_id];
        int cg_y = cg_pos / w_groups;
        int cg_x = cg_pos - cg_y * w_groups;
        /* SBT + MTS zero-out precondition (CABACReader.cpp:2414-2425) */
        if (skip_pre
            && ((h == 32 && cg_y >= (16 >> lg_ch))
                || (w == 32 && cg_x >= (16 >> lg_cw))))
            continue;
        int min_sub_pos = subset_id << log2_cg;
        int max_sub_pos = min_sub_pos + (1 << log2_cg) - 1;
        int is_last_cg = (scan_pos_last >> log2_cg) == subset_id;

        int sig_group = is_last_cg || min_sub_pos == 0;
        if (!sig_group) {
            int sig_right = (cg_x + 1 < w_groups) && sig_cg[cg_pos + 1];
            int sig_lower = (cg_y + 1 < h_groups) && sig_cg[cg_pos + w_groups];
            sig_group = dec_bin(self, sig_grp_b + (sig_right || sig_lower));
        }
        if (!sig_group)
            continue;
        sig_cg[cg_pos] = 1;
        if (cg_x > max_cg_x) max_cg_x = cg_x;
        if (cg_y > max_cg_y) max_cg_y = cg_y;

        int first_sig_pos = is_last_cg ? scan_pos_last : max_sub_pos;
        int next_sig_pos = first_sig_pos;
        int infer_sig_pos = (next_sig_pos == scan_pos_last)
                                ? next_sig_pos
                                : (subset_id != 0 ? min_sub_pos : -1);
        int num_nonzero = 0;
        int32_t *positions = sub_positions + pos_fill;
        uint32_t sub1_pattern = 0;
        int gt1_positions[64];
        uint32_t gt2_mask = 0;
        int num_gt1 = 0;
        int first_nz = next_sig_pos, last_nz = -1;
        int tmpl_cp_diag = -1, tmpl_cp_sum1 = -1;

        while (next_sig_pos >= min_sub_pos && reg_bin_limit >= 4) {
            int blk_pos = scan[next_sig_pos];
            int sig_flag = (num_nonzero == 0 && next_sig_pos == infer_sig_pos);
            if (!sig_flag) {
                int py = blk_pos >> log2_w;
                int px = blk_pos & (w - 1);
                int diag = px + py;
                int tpl_val = tpl[blk_pos];
                int num_pos = tpl_val >> 5;
                int sum_abs = tpl_val & 31;
                int ctx_ofs = ((sum_abs + 1) >> 1);
                if (ctx_ofs > 3) ctx_ofs = 3;
                ctx_ofs += (diag < 2) ? 4 : 0;
                if (ch == 0) ctx_ofs += (diag < 5) ? 4 : 0;
                tmpl_cp_diag = diag;
                tmpl_cp_sum1 = sum_abs - num_pos;
                int st = state - 1;
                if (st < 0) st = 0;
                sig_flag = dec_bin(self, sig_base[st] + ctx_ofs);
                reg_bin_limit -= 1;
            }
            if (sig_flag) {
                int off;
                if (tmpl_cp_diag != -1) {
                    off = (tmpl_cp_sum1 < 4 ? tmpl_cp_sum1 : 4) + 1;
                    if (tmpl_cp_diag == 0)
                        off += (ch == 0) ? 15 : 5;
                    else if (ch == 0)
                        off += (tmpl_cp_diag < 3) ? 10
                                                  : ((tmpl_cp_diag < 10) ? 5 : 0);
                } else {
                    off = 0;
                }
                sub1_pattern = ((state >> 1) & 1) | (sub1_pattern << 1);
                positions[num_nonzero++] = blk_pos;
                first_nz = next_sig_pos;
                if (next_sig_pos > last_nz) last_nz = next_sig_pos;
                int gt1 = dec_bin(self, gt1_b + off);
                reg_bin_limit -= 1;
                int abs_val;
                if (gt1) {
                    int par = dec_bin(self, par_b + off);
                    num_gt1 += 1;
                    reg_bin_limit -= 1;
                    int gt2 = dec_bin(self, gt2_b + off);
                    gt2_mask |= (uint32_t)gt2 << (num_gt1 - 1);
                    reg_bin_limit -= 1;
                    gt1_positions[num_gt1 - 1] = blk_pos;
                    abs_val = 2 + par + (gt2 << 1);
                    state = (int)((state_trans >> ((state << 2) + (par << 1))) & 3);
                } else {
                    abs_val = 1;
                    state = (int)((state_trans >> ((state << 2) + 2)) & 3);
                }
                coeff_abs[blk_pos] = abs_val;
                int py = blk_pos >> log2_w;
                int px = blk_pos & (w - 1);
                int upd = 32 + abs_val;
                if (py > 1) tpl[blk_pos - 2 * w] += upd;
                if (py > 0 && px > 0) tpl[blk_pos - w - 1] += upd;
                if (py > 0) tpl[blk_pos - w] += upd;
                if (px > 1) tpl[blk_pos - 2] += upd;
                if (px > 0) tpl[blk_pos - 1] += upd;
            } else {
                state = (int)((state_trans >> (state << 2)) & 3);
            }
            next_sig_pos -= 1;
        }

        /* 3rd pass: go-rice remainders for gt2 coefficients */
        uint32_t gmask = gt2_mask;
        for (int k = 0; k < num_gt1; k++) {
            if (gmask & 1) {
                int bp = gt1_positions[k];
                int sum_all = tmpl_abs_sum(bp, coeff_abs, w, h, log2_w, 4);
                int rice = GO_RICE_PARS_T[sum_all];
                int rem = dec_rem_abs(self, rice, COEF_REMAIN_BIN_REDUCTION,
                                      max_log2_tr);
                coeff_abs[bp] += rem << 1;
            }
            gmask >>= 1;
        }

        /* bypass coefficients */
        while (next_sig_pos >= min_sub_pos) {
            int sub1 = (state >> 1) & 1;
            int blk_pos = scan[next_sig_pos];
            int sum_all = tmpl_abs_sum(blk_pos, coeff_abs, w, h, log2_w, 0);
            int rice = GO_RICE_PARS_T[sum_all];
            int pos0 = (state < 2 ? 1 : 2) << rice;
            int rem = dec_rem_abs(self, rice, COEF_REMAIN_BIN_REDUCTION,
                                  max_log2_tr);
            int tcoeff = (rem == pos0) ? 0 : (rem < pos0 ? rem + 1 : rem);
            state = (int)((state_trans >> ((state << 2) + ((tcoeff & 1) << 1))) & 3);
            if (tcoeff) {
                coeff_abs[blk_pos] = tcoeff;
                sub1_pattern = sub1 | (sub1_pattern << 1);
                positions[num_nonzero++] = blk_pos;
                first_nz = next_sig_pos;
                if (next_sig_pos > last_nz) last_nz = next_sig_pos;
            }
            next_sig_pos -= 1;
        }

        /* signs */
        int hide = sign_hiding && (last_nz - first_nz >= SBH_THRESHOLD)
                   && !bdpcm;
        int num_signs = (hide && num_nonzero > 0) ? num_nonzero - 1
                                                  : num_nonzero;
        uint32_t sign_pattern = dec_bins_ep(self, num_signs);
        if (num_nonzero > num_signs) {
            int sum_abs_cg = 0;
            for (int k = 0; k < num_nonzero; k++)
                sum_abs_cg += coeff_abs[positions[k]];
            sign_pattern = (sign_pattern << 1) + (sum_abs_cg & 1);
        }
        if (num_nonzero > 0) {
            sub_meta[n_subsets_out][0] = num_nonzero;
            sub_meta[n_subsets_out][1] = (int32_t)sign_pattern;
            sub_meta[n_subsets_out][2] = (int32_t)sub1_pattern;
            sub_meta[n_subsets_out][3] = pos_fill;
            n_subsets_out += 1;
            pos_fill += num_nonzero;
        }
    }

    /* final signed write-back (dep-quant / sign application; depQuant is
     * gated on mts != MTS_SKIP by the caller — CABACReader.cpp:2460) */
    int dep_quant = dep_quant_out;
    for (int si = n_subsets_out - 1; si >= 0; si--) {
        int nnz = sub_meta[si][0];
        uint32_t sign_pattern = (uint32_t)sub_meta[si][1];
        uint32_t sub1_pattern = (uint32_t)sub_meta[si][2];
        const int32_t *positions = sub_positions + sub_meta[si][3];
        for (int k = nnz - 1; k >= 0; k--) {
            int bp = positions[k];
            int abs_c = coeff_abs[bp];
            if (dep_quant)
                abs_c = 2 * abs_c - (int)(sub1_pattern & 1);
            out[bp] = (sign_pattern & 1) ? -abs_c : abs_c;
            sign_pattern >>= 1;
            sub1_pattern >>= 1;
        }
    }

    PyBuffer_Release(&scan_buf);
    PyBuffer_Release(&scan_cg_buf);
    PyBuffer_Release(&out_buf);
    return Py_BuildValue("iii", scan_pos_last, max_cg_x, max_cg_y);
}

/* ------------------------------------------------------------------ */
/* deblocking cell filters — port of Deblocker._luma_edge_cell /        */
/* _chroma_edge_cell (vvdec_tpu/frame/deblock_np.py), parity with       */
/* vvdec LoopFilter.cpp (xEdgeFilterLuma/Chroma + pel filters).         */
/* ------------------------------------------------------------------ */

static const int16_t TC_TABLE_C[66] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 4, 4, 4, 4, 5,
    5, 5, 5, 7, 7, 8, 9, 10, 10, 11, 13, 14, 15, 17, 19, 21, 24, 25, 29, 33,
    36, 41, 45, 51, 57, 64, 71, 80, 89, 100, 112, 125, 141, 157, 177, 198,
    222, 250, 280, 314, 352, 395};
static const int8_t BETA_TABLE_C[64] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38, 40, 42,
    44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78,
    80, 82, 84, 86, 88};
static const int8_t DB_C7[7] = {59, 50, 41, 32, 23, 14, 5};
static const int8_t DB_C5[5] = {58, 45, 32, 19, 6};
static const int8_t DB_C3[3] = {53, 32, 11};
static const int8_t TC7_C[7] = {6, 5, 4, 3, 2, 1, 1};
static const int8_t TC3_C[3] = {6, 4, 2};
#define DEFAULT_INTRA_TC_OFFSET 2
#define MAX_QP_C 63

typedef struct {
    int32_t *plane;
    Py_ssize_t stride;
    int dir; /* 0: vertical edge (offsets along x), 1: horizontal */
    Py_ssize_t x, y;
    int pel_max;
} Cell;

static inline int64_t cget(const Cell *c, int line, int k)
{
    if (c->dir == 0)
        return (int64_t)c->plane[(c->y + line) * c->stride + c->x + k];
    return (int64_t)c->plane[(c->y + k) * c->stride + c->x + line];
}

static inline void cput(Cell *c, int line, int k, int64_t v)
{
    if (c->dir == 0)
        c->plane[(c->y + line) * c->stride + c->x + k] = (int32_t)v;
    else
        c->plane[(c->y + k) * c->stride + c->x + line] = (int32_t)v;
}

static inline int64_t iabs64(int64_t v) { return v < 0 ? -v : v; }
static inline int64_t imin64(int64_t a, int64_t b) { return a < b ? a : b; }
static inline int64_t imax64(int64_t a, int64_t b) { return a > b ? a : b; }

static inline int64_t calc_dp(const Cell *c, int line, int base)
{
    return iabs64(cget(c, line, base - 3) - 2 * cget(c, line, base - 2)
                  + cget(c, line, base - 1));
}

static inline int64_t calc_dq(const Cell *c, int line, int base)
{
    return iabs64(cget(c, line, base) - 2 * cget(c, line, base + 1)
                  + cget(c, line, base + 2));
}

static int use_strong(const Cell *c, int line, int64_t d2, int use_large,
                      int mfp, int mfq, int sp_large, int sq_large,
                      int64_t beta, int64_t tc)
{
    int64_t m3 = cget(c, line, -1), m4 = cget(c, line, 0);
    if (!(d2 < (beta >> 2) && iabs64(m3 - m4) < ((tc * 5 + 1) >> 1)))
        return 0;
    int64_t m0 = cget(c, line, -4), m7 = cget(c, line, 3);
    int64_t sp3 = iabs64(m0 - m3);
    int64_t sq3 = iabs64(m7 - m4);
    if (use_large) {
        if (sp_large) {
            int64_t mp4 = cget(c, line, -mfp - 1);
            if (mfp == 7)
                sp3 += iabs64(cget(c, line, -5) - cget(c, line, -6)
                              - cget(c, line, -7) + mp4);
            sp3 = (sp3 + iabs64(m0 - mp4) + 1) >> 1;
        }
        if (sq_large) {
            int64_t m11 = cget(c, line, mfq);
            if (mfq == 7)
                sq3 += iabs64(cget(c, line, 4) - cget(c, line, 5)
                              - cget(c, line, 6) + m11);
            sq3 = (sq3 + iabs64(m11 - m7) + 1) >> 1;
        }
        return ((sp3 + sq3) < (beta * 3 >> 5)) && (d2 < (beta >> 4))
               && (iabs64(m3 - m4) < ((tc * 5 + 1) >> 1));
    }
    return (sp3 + sq3) < (beta >> 3);
}

static void long_filter(Cell *c, int n_p, int n_q, int64_t tc)
{
    const int8_t *dbp = n_p == 7 ? DB_C7 : (n_p == 5 ? DB_C5 : DB_C3);
    const int8_t *dbq = n_q == 7 ? DB_C7 : (n_q == 5 ? DB_C5 : DB_C3);
    const int8_t *tcp = n_p == 3 ? TC3_C : TC7_C;
    const int8_t *tcq = n_q == 3 ? TC3_C : TC7_C;
    for (int line = 0; line < 4; line++) {
#define P(k) cget(c, line, -1 - (k))
#define Q(k) cget(c, line, (k))
        int64_t ref_p = (P(n_p - 1) + P(n_p) + 1) >> 1;
        int64_t ref_q = (Q(n_q - 1) + Q(n_q) + 1) >> 1;
        int64_t ref_m;
        if (n_p == n_q) {
            if (n_p == 5)
                ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2)) + P(3)
                         + Q(3) + P(4) + Q(4) + 8) >> 4;
            else
                ref_m = (2 * (P(0) + Q(0)) + P(1) + Q(1) + P(2) + Q(2) + P(3)
                         + Q(3) + P(4) + Q(4) + P(5) + Q(5) + P(6) + Q(6)
                         + 8) >> 4;
        } else {
            int n_l = n_p > n_q ? n_p : n_q;
            int n_s = n_p > n_q ? n_q : n_p;
            if (n_l == 7 && n_s == 5) {
                ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1)) + P(2) + Q(2) + P(3)
                         + Q(3) + P(4) + Q(4) + P(5) + Q(5) + 8) >> 4;
            } else if (n_l == 7 && n_s == 3) {
                /* pl = larger side accessor */
                int64_t pl[7], ql[3];
                for (int k = 0; k < 7; k++)
                    pl[k] = (n_q > n_p) ? Q(k) : P(k);
                for (int k = 0; k < 3; k++)
                    ql[k] = (n_q > n_p) ? P(k) : Q(k);
                ref_m = (2 * (pl[0] + ql[0]) + ql[0] + 2 * (ql[1] + ql[2])
                         + pl[1] + ql[1] + pl[2] + pl[3] + pl[4] + pl[5]
                         + pl[6] + 8) >> 4;
            } else { /* 5 & 3 */
                ref_m = (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2) + P(3) + Q(3)
                         + 4) >> 3;
            }
        }
        int64_t new_p[7], new_q[7];
        for (int pos = 0; pos < n_p; pos++) {
            int64_t src = P(pos);
            int64_t cv = (tc * tcp[pos]) >> 1;
            int64_t val = (ref_m * dbp[pos] + ref_p * (64 - dbp[pos]) + 32)
                          >> 6;
            new_p[pos] = imax64(src - cv, imin64(src + cv, val));
        }
        for (int pos = 0; pos < n_q; pos++) {
            int64_t src = Q(pos);
            int64_t cv = (tc * tcq[pos]) >> 1;
            int64_t val = (ref_m * dbq[pos] + ref_q * (64 - dbq[pos]) + 32)
                          >> 6;
            new_q[pos] = imax64(src - cv, imin64(src + cv, val));
        }
        for (int pos = 0; pos < n_p; pos++)
            cput(c, line, -1 - pos, new_p[pos]);
        for (int pos = 0; pos < n_q; pos++)
            cput(c, line, pos, new_q[pos]);
#undef P
#undef Q
    }
}

static void pel_filter_luma(Cell *c, int line, int64_t tc, int sw,
                            int64_t thr_cut, int filter_p, int filter_q)
{
    int64_t m1 = cget(c, line, -3), m2 = cget(c, line, -2);
    int64_t m3 = cget(c, line, -1), m4 = cget(c, line, 0);
    int64_t m5 = cget(c, line, 1), m6 = cget(c, line, 2);
    if (sw) {
        int64_t m0 = cget(c, line, -4), m7 = cget(c, line, 3);
#define C3(v, ref, t) imax64((ref) - (t), imin64((ref) + (t), (v)))
        cput(c, line, -3, C3((2 * m0 + 3 * m1 + m2 + m3 + m4 + 4) >> 3, m1, tc));
        cput(c, line, -2, C3((m1 + m2 + m3 + m4 + 2) >> 2, m2, 2 * tc));
        cput(c, line, -1,
             C3((m1 + 2 * m2 + 2 * m3 + 2 * m4 + m5 + 4) >> 3, m3, 3 * tc));
        cput(c, line, 0,
             C3((m2 + 2 * m3 + 2 * m4 + 2 * m5 + m6 + 4) >> 3, m4, 3 * tc));
        cput(c, line, 1, C3((m3 + m4 + m5 + m6 + 2) >> 2, m5, 2 * tc));
        cput(c, line, 2,
             C3((m3 + m4 + m5 + 3 * m6 + 2 * m7 + 4) >> 3, m6, tc));
    } else {
        int64_t delta = (9 * (m4 - m3) - 3 * (m5 - m2) + 8) >> 4;
        if (iabs64(delta) < thr_cut) {
            delta = imax64(-tc, imin64(tc, delta));
            int64_t tc2 = tc >> 1;
            int64_t pm = c->pel_max;
            cput(c, line, -1, imax64(0, imin64(pm, m3 + delta)));
            if (filter_p) {
                int64_t d1 = imax64(-tc2, imin64(tc2,
                    ((((m1 + m3 + 1) >> 1) - m2 + delta) >> 1)));
                cput(c, line, -2, imax64(0, imin64(pm, m2 + d1)));
            }
            cput(c, line, 0, imax64(0, imin64(pm, m4 - delta)));
            if (filter_q) {
                int64_t d2 = imax64(-tc2, imin64(tc2,
                    ((((m6 + m4 + 1) >> 1) - m5 - delta) >> 1)));
                cput(c, line, 1, imax64(0, imin64(pm, m5 + d2)));
            }
        }
    }
}

/* one luma 4-line edge cell (xEdgeFilterLuma body); x, y in pixels */
static void db_luma_cell(int32_t *plane, int W, int dir, int x, int y,
                         int pel_max, int bd, int ctu_size, int bs, int qp,
                         int max_fl_p, int max_fl_q, int tc_off,
                         int beta_off)
{
    Cell c = {plane, W, dir, x, y, pel_max};
    int side_p_large = max_fl_p > 3;
    int side_q_large = max_fl_q > 3;
    if (dir == 1 && (c.y & (ctu_size - 1)) == 0)
        side_p_large = 0;
    int idx_tc = qp + DEFAULT_INTRA_TC_OFFSET * (bs - 1) + 2 * tc_off;
    if (idx_tc < 0) idx_tc = 0;
    if (idx_tc > MAX_QP_C + DEFAULT_INTRA_TC_OFFSET)
        idx_tc = MAX_QP_C + DEFAULT_INTRA_TC_OFFSET;
    int idx_b = qp + 2 * beta_off;
    if (idx_b < 0) idx_b = 0;
    if (idx_b > MAX_QP_C) idx_b = MAX_QP_C;
    int64_t tc = (bd >= 10)
                     ? ((int64_t)TC_TABLE_C[idx_tc] << (bd - 10))
                     : ((TC_TABLE_C[idx_tc] + (1 << (9 - bd)))
                        >> (10 - bd));
    int64_t beta = (int64_t)BETA_TABLE_C[idx_b] << (bd - 8);
    if (beta == 0 && tc == 0)
        return;
    int64_t side_thresh = (beta + (beta >> 1)) >> 3;
    int64_t thr_cut = tc * 10;

    int64_t dp0 = calc_dp(&c, 0, 0), dq0 = calc_dq(&c, 0, 0);
    int64_t dp3 = calc_dp(&c, 3, 0), dq3 = calc_dq(&c, 3, 0);
    int64_t d0 = dp0 + dq0, d3 = dp3 + dq3;

    if (side_p_large || side_q_large) {
        int64_t dp0l = side_p_large ? ((dp0 + calc_dp(&c, 0, -3) + 1) >> 1)
                                    : dp0;
        int64_t dq0l = side_q_large ? ((dq0 + calc_dq(&c, 0, 3) + 1) >> 1)
                                    : dq0;
        int64_t dp3l = side_p_large ? ((dp3 + calc_dp(&c, 3, -3) + 1) >> 1)
                                    : dp3;
        int64_t dq3l = side_q_large ? ((dq3 + calc_dq(&c, 3, 3) + 1) >> 1)
                                    : dq3;
        int64_t d0l = dp0l + dq0l, d3l = dp3l + dq3l;
        if (d0l + d3l < beta) {
            int sw_l =
                use_strong(&c, 0, 2 * d0l, 1, max_fl_p, max_fl_q,
                           side_p_large, side_q_large, beta, tc)
                && use_strong(&c, 3, 2 * d3l, 1, max_fl_p, max_fl_q,
                              side_p_large, side_q_large, beta, tc);
            if (sw_l) {
                long_filter(&c, side_p_large ? max_fl_p : 3,
                            side_q_large ? max_fl_q : 3, tc);
                return;
            }
        }
    }
    int64_t dp = dp0 + dp3, dq = dq0 + dq3, d = d0 + d3;
    if (d >= beta)
        return;
    int filter_p = 0, filter_q = 0;
    if (max_fl_p > 1 && max_fl_q > 1) {
        filter_p = dp < side_thresh;
        filter_q = dq < side_thresh;
    }
    int sw = 0;
    if (max_fl_p > 2 && max_fl_q > 2)
        sw = use_strong(&c, 0, 2 * d0, 0, 7, 7, 0, 0, beta, tc)
             && use_strong(&c, 3, 2 * d3, 0, 7, 7, 0, 0, beta, tc);
    for (int line = 0; line < 4; line++)
        pel_filter_luma(&c, line, tc, sw, thr_cut, filter_p, filter_q);
}

/* deblock_luma_dir(plane w*, W, H, dir, n, cells y* int32[n*2 (x,y)],
 *                  params y* int32[n*6 (bs,qp,mfp,mfq,tc_off,beta_off)],
 *                  bd, ctu_size) */
static PyObject *mod_deblock_luma(PyObject *self, PyObject *args)
{
    Py_buffer plane_buf, cells_buf, params_buf;
    int W, H, dir, n, bd, ctu_size;
    if (!PyArg_ParseTuple(args, "w*iiiiy*y*ii", &plane_buf, &W, &H, &dir, &n,
                          &cells_buf, &params_buf, &bd, &ctu_size))
        return NULL;
    int32_t *plane = (int32_t *)plane_buf.buf;
    const int32_t *cells = (const int32_t *)cells_buf.buf;
    const int32_t *prm = (const int32_t *)params_buf.buf;
    int pel_max = (1 << bd) - 1;

    Py_BEGIN_ALLOW_THREADS
    for (int i = 0; i < n; i++)
        db_luma_cell(plane, W, dir, cells[2 * i], cells[2 * i + 1], pel_max,
                     bd, ctu_size, prm[6 * i], prm[6 * i + 1], prm[6 * i + 2],
                     prm[6 * i + 3], prm[6 * i + 4], prm[6 * i + 5]);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&plane_buf);
    PyBuffer_Release(&cells_buf);
    PyBuffer_Release(&params_buf);
    Py_RETURN_NONE;
}

static int chroma_strong(const Cell *c, int line, int64_t d2, int64_t beta,
                         int64_t tc, int hor_ctb)
{
    int64_t m3 = cget(c, line, -1), m4 = cget(c, line, 0);
    if (!(d2 < (beta >> 2) && iabs64(m3 - m4) < ((tc * 5 + 1) >> 1)))
        return 0;
    int64_t m0 = cget(c, line, -4), m7 = cget(c, line, 3);
    int64_t m2 = cget(c, line, -2);
    int64_t sp3 = hor_ctb ? iabs64(m2 - m3) : iabs64(m0 - m3);
    int64_t sq3 = iabs64(m7 - m4);
    return (sp3 + sq3) < (beta >> 3);
}

static void pel_filter_chroma(Cell *c, int line, int64_t tc, int sw,
                              int hor_ctb)
{
    int64_t m2 = cget(c, line, -2), m3 = cget(c, line, -1);
    int64_t m4 = cget(c, line, 0), m5 = cget(c, line, 1);
    if (sw) {
        int64_t m6 = cget(c, line, 2), m7 = cget(c, line, 3);
        if (hor_ctb) {
            cput(c, line, -1, C3((3 * m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3, tc));
            cput(c, line, 0,
                 C3((2 * m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4, tc));
            cput(c, line, 1,
                 C3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5, tc));
            cput(c, line, 2,
                 C3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6, tc));
        } else {
            int64_t m0 = cget(c, line, -4), m1 = cget(c, line, -3);
            cput(c, line, -3, C3((3 * m0 + 2 * m1 + m2 + m3 + m4 + 4) >> 3, m1, tc));
            cput(c, line, -2,
                 C3((2 * m0 + m1 + 2 * m2 + m3 + m4 + m5 + 4) >> 3, m2, tc));
            cput(c, line, -1,
                 C3((m0 + m1 + m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3, tc));
            cput(c, line, 0,
                 C3((m1 + m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4, tc));
            cput(c, line, 1,
                 C3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5, tc));
            cput(c, line, 2,
                 C3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6, tc));
        }
    } else {
        int64_t delta = imax64(-tc, imin64(tc,
            ((((m4 - m3) * 4) + m2 - m5 + 4) >> 3)));
        int64_t pm = c->pel_max;
        cput(c, line, -1, imax64(0, imin64(pm, m3 + delta)));
        cput(c, line, 0, imax64(0, imin64(pm, m4 - delta)));
    }
}

/* one chroma edge cell (xEdgeFilterChroma body); ccx, ccy chroma samples */
static void db_chroma_cell(int32_t *plane, int W, int dir, int ccx, int ccy,
                           int pel_max, int bd, int loop_len, int sub_shift,
                           int bs, int qp, int large, int tc_off,
                           int beta_off, int hor_ctb)
{
    Cell c = {plane, W, dir, ccx, ccy, pel_max};
    int idx_tc = qp + DEFAULT_INTRA_TC_OFFSET * (bs - 1) + 2 * tc_off;
    if (idx_tc < 0) idx_tc = 0;
    if (idx_tc > MAX_QP_C + DEFAULT_INTRA_TC_OFFSET)
        idx_tc = MAX_QP_C + DEFAULT_INTRA_TC_OFFSET;
    int64_t tc = (bd >= 10)
                     ? ((int64_t)TC_TABLE_C[idx_tc] << (bd - 10))
                     : ((TC_TABLE_C[idx_tc] + (1 << (9 - bd)))
                        >> (10 - bd));
    if (tc == 0 && !large)
        return;
    int sw = 0;
    if (large) {
        int idx_b = qp + 2 * beta_off;
        if (idx_b < 0) idx_b = 0;
        if (idx_b > MAX_QP_C) idx_b = MAX_QP_C;
        int64_t beta = (int64_t)BETA_TABLE_C[idx_b] << (bd - 8);
        int line3 = sub_shift == 1 ? 1 : 3;
        int64_t dp0 = hor_ctb
            ? iabs64(cget(&c, 0, -2) - 2 * cget(&c, 0, -2) + cget(&c, 0, -1))
            : iabs64(cget(&c, 0, -3) - 2 * cget(&c, 0, -2) + cget(&c, 0, -1));
        int64_t dq0 = iabs64(cget(&c, 0, 0) - 2 * cget(&c, 0, 1)
                             + cget(&c, 0, 2));
        int64_t dp3 = hor_ctb
            ? iabs64(cget(&c, line3, -2) - 2 * cget(&c, line3, -2)
                     + cget(&c, line3, -1))
            : iabs64(cget(&c, line3, -3) - 2 * cget(&c, line3, -2)
                     + cget(&c, line3, -1));
        int64_t dq3 = iabs64(cget(&c, line3, 0) - 2 * cget(&c, line3, 1)
                             + cget(&c, line3, 2));
        int64_t d0 = dp0 + dq0, d3 = dp3 + dq3;
        if (d0 + d3 < beta)
            sw = chroma_strong(&c, 0, 2 * d0, beta, tc, hor_ctb)
                 && chroma_strong(&c, line3, 2 * d3, beta, tc, hor_ctb);
    }
    for (int line = 0; line < loop_len; line++)
        pel_filter_chroma(&c, line, tc, sw, hor_ctb);
}

/* deblock_chroma_dir(plane w*, W, H, dir, n,
 *                    cells y* int32[n*2 (ccx,ccy)],
 *                    params y* int32[n*6 (bs,qp,cmfl,tc_off,beta_off,
 *                                         hor_ctb)],
 *                    bd, loop_len, sub_shift) — one call per component. */
static PyObject *mod_deblock_chroma(PyObject *self, PyObject *args)
{
    Py_buffer plane_buf, cells_buf, params_buf;
    int W, H, dir, n, bd, loop_len, sub_shift;
    if (!PyArg_ParseTuple(args, "w*iiiiy*y*iii", &plane_buf, &W, &H, &dir, &n,
                          &cells_buf, &params_buf, &bd, &loop_len,
                          &sub_shift))
        return NULL;
    int32_t *plane = (int32_t *)plane_buf.buf;
    const int32_t *cells = (const int32_t *)cells_buf.buf;
    const int32_t *prm = (const int32_t *)params_buf.buf;
    int pel_max = (1 << bd) - 1;

    Py_BEGIN_ALLOW_THREADS
    for (int i = 0; i < n; i++)
        db_chroma_cell(plane, W, dir, cells[2 * i], cells[2 * i + 1],
                       pel_max, bd, loop_len, sub_shift, prm[6 * i],
                       prm[6 * i + 1], prm[6 * i + 2], prm[6 * i + 3],
                       prm[6 * i + 4], prm[6 * i + 5]);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&plane_buf);
    PyBuffer_Release(&cells_buf);
    PyBuffer_Release(&params_buf);
    Py_RETURN_NONE;
}

/* full syntax walk (coding tree / CU / TU / residual) — see walk.c */
#include "walk.c"
#include "walk2.c"
#include "walk3.c"
#include "walk4.c"
#include "walk5.c"
#include "walk6.c"
#include "walk7.c"
#include "walk8.c"
#include "walk9.c"

static PyMemberDef Decoder_members[] = {
    {"pos", T_PYSSIZET, offsetof(Decoder, pos), 0, "read position"},
    {"end", T_PYSSIZET, offsetof(Decoder, end), 0, "end position"},
    {"bits_needed", T_INT, offsetof(Decoder, bits_needed), 0, NULL},
    {NULL},
};

static PyObject *Decoder_get_data(Decoder *self, void *closure)
{
    Py_INCREF(self->data_obj);
    return self->data_obj;
}

static PyGetSetDef Decoder_getset[] = {
    {"data", (getter)Decoder_get_data, NULL, "input bytes", NULL},
    {NULL},
};

static PyMethodDef Decoder_methods[] = {
    {"ctx_init", (PyCFunction)Decoder_ctx_init, METH_VARARGS, NULL},
    {"start", (PyCFunction)Decoder_start, METH_NOARGS, NULL},
    {"restart", (PyCFunction)Decoder_restart, METH_VARARGS, NULL},
    {"decode_bin", (PyCFunction)Decoder_decode_bin, METH_O, NULL},
    {"decode_bin_ep", (PyCFunction)Decoder_decode_bin_ep, METH_NOARGS, NULL},
    {"decode_bins_ep", (PyCFunction)Decoder_decode_bins_ep, METH_O, NULL},
    {"decode_rem_abs_ep", (PyCFunction)Decoder_decode_rem_abs_ep,
     METH_VARARGS, NULL},
    {"decode_bin_trm", (PyCFunction)Decoder_decode_bin_trm, METH_NOARGS, NULL},
    {"align", (PyCFunction)Decoder_align, METH_NOARGS, NULL},
    {"finish_ok", (PyCFunction)Decoder_finish_ok, METH_NOARGS, NULL},
    {"ctx_save", (PyCFunction)Decoder_ctx_save, METH_NOARGS, NULL},
    {"ctx_load", (PyCFunction)Decoder_ctx_load, METH_O, NULL},
    {"decode_residual", (PyCFunction)Decoder_decode_residual, METH_VARARGS,
     NULL},
    {"walk_begin", (PyCFunction)Decoder_walk_begin, METH_VARARGS,
     "start a native syntax-walk session for one slice"},
    {NULL},
};

static PyTypeObject DecoderType = {
    PyVarObject_HEAD_INIT(NULL, 0).tp_name = "_cabac.Decoder",
    .tp_basicsize = sizeof(Decoder),
    .tp_dealloc = (destructor)Decoder_dealloc,
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "native CABAC arithmetic decoder",
    .tp_methods = Decoder_methods,
    .tp_members = Decoder_members,
    .tp_getset = Decoder_getset,
    .tp_init = (initproc)Decoder_init,
    .tp_new = PyType_GenericNew,
};

/* alf_diamond(src y* int32[h*w], dst w* int32[h*w], h, w, n_taps,
 *             co4 y* int32[h4*w4*n_taps], cl4 y* int32[h4*w4*n_taps],
 *             dmap y* int32[h*4], near y* uint8[h], mask y* uint8[h*w],
 *             bd)
 * Whole-frame clipped-diamond ALF with per-4x4 coefficients and the
 * per-row virtual-boundary tap clamping; whole-picture clamp windows
 * (the restricted loop-filter-across cases stay on the numpy path).
 * Parity: AdaptiveLoopFilter::filterBlk / frame/alf_np.filter_*_frame. */
static const int8_t ALF_TAPS_Y[12][2] = {
    {3, 0}, {2, 1}, {2, 0}, {2, -1}, {1, 2},  {1, 1},
    {1, 0}, {1, -1}, {1, -2}, {0, 3}, {0, 2}, {0, 1}};
static const int8_t ALF_TAPS_C[6][2] = {{2, 0}, {1, 1}, {1, 0},
                                        {1, -1}, {0, 2}, {0, 1}};

/* generic per-pixel tap loop with x-border clamping (picture edges and
 * masked-run boundaries) */
static inline void alf_pixel_generic(
    const int32_t *row, int32_t *out, int x, int w,
    const int32_t *co, const int32_t *cl,
    const int32_t *const *pa, const int32_t *const *pb,
    const int8_t (*taps)[2], int n_taps, int rnd, int sh, int pel_max)
{
    const int32_t curr = row[x];
    int32_t acc = 0;
    for (int k = 0; k < n_taps; k++) {
        const int dx = taps[k][1];
        int xa = x + dx, xb = x - dx;
        if (xa > w - 1) xa = w - 1;
        if (xa < 0) xa = 0;
        if (xb > w - 1) xb = w - 1;
        if (xb < 0) xb = 0;
        int32_t a = pa[k][xa] - curr;
        int32_t b = pb[k][xb] - curr;
        const int32_t c = cl[k];
        if (a > c) a = c;
        if (a < -c) a = -c;
        if (b > c) b = c;
        if (b < -c) b = -c;
        acc += co[k] * (a + b);
    }
    int32_t v = ((acc + rnd) >> sh) + curr;
    if (v < 0) v = 0;
    if (v > pel_max) v = pel_max;
    out[x] = v;
}

/* interior run (no x clamping, no mask): tap count fixed so the
 * compiler unrolls k and vectorizes over x */
#define ALF_ROW_FN(NAME, NT, TAPTBL)                                     \
static void NAME(const int32_t *row, int32_t *out,                       \
                 const int32_t *co_row, const int32_t *cl_row,            \
                 const int32_t *const *pa, const int32_t *const *pb,      \
                 int x0, int x1, int rnd, int sh, int pel_max)            \
{                                                                         \
    for (int x = x0; x < x1; x++) {                                       \
        const int32_t *co = co_row + (size_t)(x >> 2) * NT;               \
        const int32_t *cl = cl_row + (size_t)(x >> 2) * NT;               \
        const int32_t curr = row[x];                                      \
        int32_t acc = 0;                                                  \
        for (int k = 0; k < NT; k++) {                                    \
            const int dx = TAPTBL[k][1];                                  \
            int32_t a = pa[k][x + dx] - curr;                             \
            int32_t b = pb[k][x - dx] - curr;                             \
            const int32_t c = cl[k];                                      \
            if (a > c) a = c;                                             \
            if (a < -c) a = -c;                                           \
            if (b > c) b = c;                                             \
            if (b < -c) b = -c;                                           \
            acc += co[k] * (a + b);                                       \
        }                                                                 \
        int32_t v = ((acc + rnd) >> sh) + curr;                           \
        if (v < 0) v = 0;                                                 \
        if (v > pel_max) v = pel_max;                                     \
        out[x] = v;                                                       \
    }                                                                     \
}
ALF_ROW_FN(alf_row12, 12, ALF_TAPS_Y)
ALF_ROW_FN(alf_row6, 6, ALF_TAPS_C)

static PyObject *mod_alf_diamond(PyObject *self, PyObject *args)
{
    Py_buffer b_src, b_dst, b_co, b_cl, b_dmap, b_near, b_mask;
    int h, w, n_taps, bd;
    if (!PyArg_ParseTuple(args, "y*w*iiiy*y*y*y*y*i", &b_src, &b_dst, &h,
                          &w, &n_taps, &b_co, &b_cl, &b_dmap, &b_near,
                          &b_mask, &bd))
        return NULL;
    const int32_t *src = (const int32_t *)b_src.buf;
    int32_t *dst = (int32_t *)b_dst.buf;
    const int32_t *co4 = (const int32_t *)b_co.buf;
    const int32_t *cl4 = (const int32_t *)b_cl.buf;
    const int32_t *dmap = (const int32_t *)b_dmap.buf;
    const uint8_t *nearv = (const uint8_t *)b_near.buf;
    const uint8_t *mask = (const uint8_t *)b_mask.buf;
    const int pel_max = (1 << bd) - 1;
    const int w4 = w >> 2;
    const int8_t(*taps)[2] = n_taps == 6 ? ALF_TAPS_C : ALF_TAPS_Y;
    const int border = n_taps == 6 ? 2 : 3; /* max |dx| */
    Py_BEGIN_ALLOW_THREADS
    for (int y = 0; y < h; y++) {
        const int32_t *dr = dmap + (size_t)y * 4;
        const int rnd = nearv[y] ? (1 << 9) : 64;
        const int sh = nearv[y] ? 10 : 7;
        const int32_t *row = src + (size_t)y * w;
        int32_t *out = dst + (size_t)y * w;
        const uint8_t *mrow = mask + (size_t)y * w;
        const int32_t *cob = co4 + (size_t)(y >> 2) * w4 * n_taps;
        const int32_t *clb = cl4 + (size_t)(y >> 2) * w4 * n_taps;
        /* per-row tap source rows: virtual-boundary distance + picture-
         * edge clamping hoisted out of the pixel loop */
        const int32_t *pa[12], *pb[12];
        for (int k = 0; k < n_taps; k++) {
            const int dd = dr[taps[k][0]];
            int ya = y + dd, yb = y - dd;
            if (ya > h - 1) ya = h - 1;
            if (ya < 0) ya = 0;
            if (yb > h - 1) yb = h - 1;
            if (yb < 0) yb = 0;
            pa[k] = src + (size_t)ya * w;
            pb[k] = src + (size_t)yb * w;
        }
        const int xin0 = border, xin1 = w - border;
        for (int x = 0; x < xin0 && x < w; x++)
            if (mrow[x])
                alf_pixel_generic(row, out, x, w,
                                  cob + (size_t)(x >> 2) * n_taps,
                                  clb + (size_t)(x >> 2) * n_taps,
                                  pa, pb, taps, n_taps, rnd, sh, pel_max);
        int x = xin0;
        while (x < xin1) {
            if (!mrow[x]) {
                x++;
                continue;
            }
            int e = x;
            while (e < xin1 && mrow[e])
                e++;
            if (n_taps == 6)
                alf_row6(row, out, cob, clb, pa, pb, x, e, rnd, sh,
                         pel_max);
            else
                alf_row12(row, out, cob, clb, pa, pb, x, e, rnd, sh,
                          pel_max);
            x = e;
        }
        for (int x2 = xin1 > xin0 ? xin1 : xin0; x2 < w; x2++)
            if (mrow[x2])
                alf_pixel_generic(row, out, x2, w,
                                  cob + (size_t)(x2 >> 2) * n_taps,
                                  clb + (size_t)(x2 >> 2) * n_taps,
                                  pa, pb, taps, n_taps, rnd, sh, pel_max);
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_src);
    PyBuffer_Release(&b_dst);
    PyBuffer_Release(&b_co);
    PyBuffer_Release(&b_cl);
    PyBuffer_Release(&b_dmap);
    PyBuffer_Release(&b_near);
    PyBuffer_Release(&b_mask);
    Py_RETURN_NONE;
}

/* alf_apply(src y* int32[h*w], dst w* int32[h*w], h, w, n_taps,
 *   banks_co y* int32, banks_cl y* int32, stride,
 *   idx y* int32[h4*w4] (bank row per 4x4: co = banks_co + idx*stride),
 *   mask4 y* uint8[h4*w4], dmap y* int32[h*4], near y* uint8[h], bd)
 *
 * Whole-plane clipped-diamond ALF in one pass: filters active 4x4
 * blocks, copies inactive pixels through to dst (the m_alfBuf second-
 * buffer scheme, AdaptiveLoopFilter.cpp:466-479) — no Python-side
 * coefficient materialization or plane copies. */
#define ALF_APPLY_ROW(NAME, NT, TAPTBL)                                   \
static void NAME(const int32_t *restrict row, int32_t *restrict out,      \
                 const int32_t *banks_co, const int32_t *banks_cl,        \
                 int stride, const int32_t *idx_row,                      \
                 const int32_t *const *pa, const int32_t *const *pb,      \
                 int x0, int x1, int rnd, int sh, int pel_max)            \
{                                                                         \
    int x = x0;                                                           \
    /* head to the 4-aligned block grid */                                \
    for (; x < x1 && (x & 3); x++)                                        \
        alf_apix_##NAME(row, out, banks_co, banks_cl, stride, idx_row,   \
                        pa, pb, x, rnd, sh, pel_max);                     \
    /* whole blocks: coefficients constant, 4-lane accumulator */         \
    for (; x + 4 <= x1; x += 4) {                                         \
        const size_t bo = (size_t)idx_row[x >> 2] * stride;               \
        const int32_t *co = banks_co + bo;                                \
        const int32_t *cl = banks_cl + bo;                                \
        int32_t acc[4] = {0, 0, 0, 0};                                    \
        const int32_t cur0 = row[x], cur1 = row[x + 1];                   \
        const int32_t cur2 = row[x + 2], cur3 = row[x + 3];               \
        for (int k = 0; k < NT; k++) {                                    \
            const int dx = TAPTBL[k][1];                                  \
            const int32_t *ra = pa[k] + x + dx;                           \
            const int32_t *rb = pb[k] + x - dx;                           \
            const int32_t c = cl[k], w_ = co[k];                          \
            for (int j = 0; j < 4; j++) {                                 \
                const int32_t curr = j == 0 ? cur0 : j == 1 ? cur1        \
                                   : j == 2 ? cur2 : cur3;                \
                int32_t a = ra[j] - curr;                                 \
                int32_t b = rb[j] - curr;                                 \
                if (a > c) a = c;                                         \
                if (a < -c) a = -c;                                       \
                if (b > c) b = c;                                         \
                if (b < -c) b = -c;                                       \
                acc[j] += w_ * (a + b);                                   \
            }                                                             \
        }                                                                 \
        for (int j = 0; j < 4; j++) {                                     \
            const int32_t curr = row[x + j];                              \
            int32_t v = ((acc[j] + rnd) >> sh) + curr;                   \
            if (v < 0) v = 0;                                             \
            if (v > pel_max) v = pel_max;                                 \
            out[x + j] = v;                                               \
        }                                                                 \
    }                                                                     \
    for (; x < x1; x++)                                                   \
        alf_apix_##NAME(row, out, banks_co, banks_cl, stride, idx_row,   \
                        pa, pb, x, rnd, sh, pel_max);                     \
}
#define ALF_APPLY_PIX(NAME, NT, TAPTBL)                                   \
static inline void alf_apix_##NAME(                                      \
    const int32_t *restrict row, int32_t *restrict out,                   \
    const int32_t *banks_co, const int32_t *banks_cl, int stride,         \
    const int32_t *idx_row, const int32_t *const *pa,                     \
    const int32_t *const *pb, int x, int rnd, int sh, int pel_max)        \
{                                                                         \
    const size_t bo = (size_t)idx_row[x >> 2] * stride;                   \
    const int32_t *co = banks_co + bo;                                    \
    const int32_t *cl = banks_cl + bo;                                    \
    const int32_t curr = row[x];                                          \
    int32_t acc = 0;                                                      \
    for (int k = 0; k < NT; k++) {                                        \
        const int dx = TAPTBL[k][1];                                      \
        int32_t a = pa[k][x + dx] - curr;                                 \
        int32_t b = pb[k][x - dx] - curr;                                 \
        const int32_t c = cl[k];                                          \
        if (a > c) a = c;                                                 \
        if (a < -c) a = -c;                                               \
        if (b > c) b = c;                                                 \
        if (b < -c) b = -c;                                               \
        acc += co[k] * (a + b);                                           \
    }                                                                     \
    int32_t v = ((acc + rnd) >> sh) + curr;                              \
    if (v < 0) v = 0;                                                     \
    if (v > pel_max) v = pel_max;                                         \
    out[x] = v;                                                           \
}
ALF_APPLY_PIX(alf_apply_row12, 12, ALF_TAPS_Y)
ALF_APPLY_PIX(alf_apply_row6, 6, ALF_TAPS_C)
ALF_APPLY_ROW(alf_apply_row12, 12, ALF_TAPS_Y)
ALF_APPLY_ROW(alf_apply_row6, 6, ALF_TAPS_C)

static PyObject *mod_alf_apply(PyObject *self, PyObject *args)
{
    Py_buffer b_src, b_dst, b_co, b_cl, b_idx, b_m4, b_dmap, b_near;
    int h, w, n_taps, stride, bd;
    if (!PyArg_ParseTuple(args, "y*w*iiiy*y*iy*y*y*y*i", &b_src, &b_dst,
                          &h, &w, &n_taps, &b_co, &b_cl, &stride, &b_idx,
                          &b_m4, &b_dmap, &b_near, &bd))
        return NULL;
    const int32_t *src = (const int32_t *)b_src.buf;
    int32_t *dst = (int32_t *)b_dst.buf;
    const int32_t *banks_co = (const int32_t *)b_co.buf;
    const int32_t *banks_cl = (const int32_t *)b_cl.buf;
    const int32_t *idx = (const int32_t *)b_idx.buf;
    const uint8_t *mask4 = (const uint8_t *)b_m4.buf;
    const int32_t *dmap = (const int32_t *)b_dmap.buf;
    const uint8_t *nearv = (const uint8_t *)b_near.buf;
    const int pel_max = (1 << bd) - 1;
    const int w4 = w >> 2;
    const int8_t(*taps)[2] = n_taps == 6 ? ALF_TAPS_C : ALF_TAPS_Y;
    const int border = n_taps == 6 ? 2 : 3;
    Py_BEGIN_ALLOW_THREADS
    for (int y = 0; y < h; y++) {
        const int32_t *dr = dmap + (size_t)y * 4;
        const int rnd = nearv[y] ? (1 << 9) : 64;
        const int sh = nearv[y] ? 10 : 7;
        const int32_t *row = src + (size_t)y * w;
        int32_t *out = dst + (size_t)y * w;
        const int32_t *idx_row = idx + (size_t)(y >> 2) * w4;
        const uint8_t *mrow4 = mask4 + (size_t)(y >> 2) * w4;
        const int32_t *pa[12], *pb[12];
        for (int k = 0; k < n_taps; k++) {
            const int dd = dr[taps[k][0]];
            int ya = y + dd, yb = y - dd;
            if (ya > h - 1) ya = h - 1;
            if (ya < 0) ya = 0;
            if (yb > h - 1) yb = h - 1;
            if (yb < 0) yb = 0;
            pa[k] = src + (size_t)ya * w;
            pb[k] = src + (size_t)yb * w;
        }
        /* copy-through for inactive blocks + filter for active runs;
         * block granularity is 4 px, picture borders take the generic
         * x-clamped path */
        int x4 = 0;
        while (x4 < w4) {
            if (!mrow4[x4]) {
                int e4 = x4;
                while (e4 < w4 && !mrow4[e4])
                    e4++;
                memcpy(out + (x4 << 2), row + (x4 << 2),
                       (size_t)((e4 - x4) << 2) * sizeof(int32_t));
                x4 = e4;
                continue;
            }
            int e4 = x4;
            while (e4 < w4 && mrow4[e4])
                e4++;
            int xs = x4 << 2, xe = e4 << 2;
            if (xe > w) xe = w;
            /* generic edges within the run */
            for (; xs < xe && xs < border; xs++) {
                const size_t bo = (size_t)idx_row[xs >> 2] * stride;
                alf_pixel_generic(row, out, xs, w, banks_co + bo,
                                  banks_cl + bo, pa, pb, taps, n_taps,
                                  rnd, sh, pel_max);
            }
            int xi = xe < w - border ? xe : w - border;
            if (xi > xs) {
                if (n_taps == 6)
                    alf_apply_row6(row, out, banks_co, banks_cl, stride,
                                   idx_row, pa, pb, xs, xi, rnd, sh,
                                   pel_max);
                else
                    alf_apply_row12(row, out, banks_co, banks_cl, stride,
                                    idx_row, pa, pb, xs, xi, rnd, sh,
                                    pel_max);
                xs = xi;
            }
            for (; xs < xe; xs++) {
                const size_t bo = (size_t)idx_row[xs >> 2] * stride;
                alf_pixel_generic(row, out, xs, w, banks_co + bo,
                                  banks_cl + bo, pa, pb, taps, n_taps,
                                  rnd, sh, pel_max);
            }
            x4 = e4;
        }
        /* trailing partial block column (w not multiple of 4) */
        for (int x = w4 << 2; x < w; x++) {
            if (mrow4[w4 - 1 < (x >> 2) ? w4 - 1 : (x >> 2)]) {
                const size_t bo =
                    (size_t)idx_row[(x >> 2) < w4 ? (x >> 2) : w4 - 1]
                    * stride;
                alf_pixel_generic(row, out, x, w, banks_co + bo,
                                  banks_cl + bo, pa, pb, taps, n_taps,
                                  rnd, sh, pel_max);
            } else {
                out[x] = row[x];
            }
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_src);
    PyBuffer_Release(&b_dst);
    PyBuffer_Release(&b_co);
    PyBuffer_Release(&b_cl);
    PyBuffer_Release(&b_idx);
    PyBuffer_Release(&b_m4);
    PyBuffer_Release(&b_dmap);
    PyBuffer_Release(&b_near);
    Py_RETURN_NONE;
}

/* alf_classify(src y* int32[h*w], cls w* int32[h4*w4],
 *              tr w* int32[h4*w4], h, w, bd, vb_h, vb_pos)
 * Whole-frame 4x4 ALF classification (deriveClassificationBlk);
 * whole-picture clamp windows.  Parity: alf_np.classify_frame. */
static PyObject *mod_alf_classify(PyObject *self, PyObject *args)
{
    Py_buffer b_src, b_cls, b_tr;
    int h, w, bd, vb_h, vb_pos;
    if (!PyArg_ParseTuple(args, "y*w*w*iiiii", &b_src, &b_cls, &b_tr, &h,
                          &w, &bd, &vb_h, &vb_pos))
        return NULL;
    const int32_t *src = (const int32_t *)b_src.buf;
    int32_t *cls_out = (int32_t *)b_cls.buf;
    int32_t *tr_out = (int32_t *)b_tr.buf;
    const int gh = (h + 4) / 2;
    const int gw = (w + 4) / 2;
    const int h4 = h / 4, w4 = w / 4;
    int32_t *lap = (int32_t *)malloc((size_t)4 * gh * gw * sizeof(int32_t));
    int32_t *agg = (int32_t *)malloc((size_t)4 * gh * gw * sizeof(int32_t));
    if (!lap || !agg) {
        free(lap);
        free(agg);
        PyBuffer_Release(&b_src);
        PyBuffer_Release(&b_cls);
        PyBuffer_Release(&b_tr);
        return PyErr_NoMemory();
    }
    Py_BEGIN_ALLOW_THREADS
    static const int8_t ACT_TH_C[16] = {0, 1, 2, 2, 2, 2, 2, 3,
                                        3, 3, 3, 3, 3, 3, 3, 4};
    static const int8_t TRSP_C[8] = {0, 1, 0, 2, 2, 3, 1, 3};
    for (int gi = 0; gi < gh; gi++) {
        const int i = gi * 2;
        const int yoff = i - 2;
        int r0 = yoff - 1, r1 = yoff, r2 = yoff + 1, r3 = yoff + 2;
        if (yoff > 0 && ((yoff % vb_h) + vb_h) % vb_h == vb_pos - 2)
            r3 = r2;
        else if (yoff > 0 && ((yoff % vb_h) + vb_h) % vb_h == vb_pos)
            r0 = r1;
#define CLP(v, lim) ((v) < 0 ? 0 : ((v) > (lim) ? (lim) : (v)))
        const int32_t *s0 = src + (size_t)CLP(r0, h - 1) * w;
        const int32_t *s1 = src + (size_t)CLP(r1, h - 1) * w;
        const int32_t *s2 = src + (size_t)CLP(r2, h - 1) * w;
        const int32_t *s3 = src + (size_t)CLP(r3, h - 1) * w;
        for (int gj = 0; gj < gw; gj++) {
            const int pix = gj * 2 - 2;
            const int cm1 = CLP(pix - 1, w - 1), c0 = CLP(pix, w - 1);
            const int cp1 = CLP(pix + 1, w - 1), cp2 = CLP(pix + 2, w - 1);
            const int32_t y0v = s1[c0] * 2;
            const int32_t yup1 = s2[cp1] * 2;
            const size_t gx = (size_t)gi * gw + gj;
            lap[0 * gh * gw + gx] = abs(y0v - s0[c0] - s2[c0])
                + abs(yup1 - s1[cp1] - s3[cp1]);
            lap[1 * gh * gw + gx] = abs(y0v - s1[cp1] - s1[cm1])
                + abs(yup1 - s2[cp2] - s2[c0]);
            lap[2 * gh * gw + gx] = abs(y0v - s0[cm1] - s2[cp1])
                + abs(yup1 - s1[c0] - s3[cp2]);
            lap[3 * gh * gw + gx] = abs(y0v - s2[cm1] - s0[cp1])
                + abs(yup1 - s3[c0] - s1[cp2]);
        }
    }
    for (int d = 0; d < 4; d++) {
        const int32_t *lp = lap + (size_t)d * gh * gw;
        int32_t *ag = agg + (size_t)d * gh * gw;
        for (int gi = 0; gi < gh; gi++) {
            const int32_t *r = lp + (size_t)gi * gw;
            int32_t *o = ag + (size_t)gi * gw;
            for (int gj = 0; gj < gw; gj++) {
                int32_t v = r[gj];
                if (gj + 1 < gw) v += r[gj + 1];
                if (gj + 2 < gw) v += r[gj + 2];
                if (gj + 3 < gw) v += r[gj + 3];
                o[gj] = v;
            }
        }
    }
    const int shift = bd + 4;
    for (int bi = 0; bi < h4; bi++) {
        const int rr = bi * 2;
        const int ymod = (bi * 4) % vb_h;
        int rs = 0, re = 4, mul = 64;
        if (ymod == vb_pos - 4) {
            re = 3;
            mul = 96;
        } else if (ymod == vb_pos) {
            rs = 1;
            mul = 96;
        }
        for (int bj = 0; bj < w4; bj++) {
            const int cc = bj * 2;
            int64_t sums[4];
            for (int d = 0; d < 4; d++) {
                const int32_t *ag = agg + (size_t)d * gh * gw;
                int64_t s = 0;
                for (int k = rs; k < re; k++)
                    s += ag[(size_t)(rr + k) * gw + cc];
                sums[d] = s;
            }
            const int64_t sum_v = sums[0], sum_h = sums[1];
            const int64_t sum_d0 = sums[2], sum_d1 = sums[3];
            int act = (int)(((sum_v + sum_h) * mul) >> shift);
            if (act < 0) act = 0;
            if (act > 15) act = 15;
            int cls = ACT_TH_C[act];
            int64_t hv1, hv0, d1, d0;
            int dir_hv, dir_d;
            if (sum_v > sum_h) {
                hv1 = sum_v; hv0 = sum_h; dir_hv = 1;
            } else {
                hv1 = sum_h; hv0 = sum_v; dir_hv = 3;
            }
            if (sum_d0 > sum_d1) {
                d1 = sum_d0; d0 = sum_d1; dir_d = 0;
            } else {
                d1 = sum_d1; d0 = sum_d0; dir_d = 2;
            }
            int64_t hvd1, hvd0;
            int main_dir, sec_dir;
            if (d1 * hv0 > hv1 * d0) {
                hvd1 = d1; hvd0 = d0; main_dir = dir_d; sec_dir = dir_hv;
            } else {
                hvd1 = hv1; hvd0 = hv0; main_dir = dir_hv; sec_dir = dir_d;
            }
            int strength = 0;
            if (hvd1 > 2 * hvd0) strength = 1;
            if (hvd1 * 2 > 9 * hvd0) strength = 2;
            if (strength)
                cls += (((main_dir & 1) << 1) + strength) * 5;
            cls_out[(size_t)bi * w4 + bj] = cls;
            tr_out[(size_t)bi * w4 + bj] =
                TRSP_C[main_dir * 2 + (sec_dir >> 1)];
        }
    }
#undef CLP
    Py_END_ALLOW_THREADS
    free(lap);
    free(agg);
    PyBuffer_Release(&b_src);
    PyBuffer_Release(&b_cls);
    PyBuffer_Release(&b_tr);
    Py_RETURN_NONE;
}

/* sao_plane(src y* int32[h*w], dst w* int32[h*w], h, w,
 *           type_map y* uint8[h*w], ctu_idx y* int32[h*w],
 *           tables y* int32[n_ctu*37], mask y* uint8[h*w], bd)
 * Whole-plane SAO from the per-pixel parameter maps
 * (sao_np.sao_prepare_maps).  Parity: sao_np.sao_frame. */
static PyObject *mod_sao_plane(PyObject *self, PyObject *args)
{
    Py_buffer b_src, b_dst, b_typ, b_cix, b_tab, b_mask;
    int h, w, bd;
    if (!PyArg_ParseTuple(args, "y*w*iiy*y*y*y*i", &b_src, &b_dst, &h, &w,
                          &b_typ, &b_cix, &b_tab, &b_mask, &bd))
        return NULL;
    const int32_t *src = (const int32_t *)b_src.buf;
    int32_t *dst = (int32_t *)b_dst.buf;
    const uint8_t *typm = (const uint8_t *)b_typ.buf;
    const int32_t *cix = (const int32_t *)b_cix.buf;
    const int32_t *tab = (const int32_t *)b_tab.buf;
    const uint8_t *mask = (const uint8_t *)b_mask.buf;
    const int pel_max = (1 << bd) - 1;
    const int bshift = bd - 5;
    static const int8_t NB[4][4] = {/* dy1, dx1, dy2, dx2 per EO class */
                                    {0, -1, 0, 1},
                                    {-1, 0, 1, 0},
                                    {-1, -1, 1, 1},
                                    {-1, 1, 1, -1}};
    Py_BEGIN_ALLOW_THREADS
    for (int y = 0; y < h; y++) {
        const int32_t *row = src + (size_t)y * w;
        int32_t *orow = dst + (size_t)y * w;
        const uint8_t *mrow = mask + (size_t)y * w;
        const uint8_t *trow = typm + (size_t)y * w;
        const int32_t *crow = cix + (size_t)y * w;
        for (int x = 0; x < w; x++) {
            if (!mrow[x])
                continue;
            const int t = trow[x];
            const int32_t c = row[x];
            int idx;
            if (t == 4) {
                idx = 5 + (c >> bshift);
            } else {
                int y1 = y + NB[t][0], x1 = x + NB[t][1];
                int y2 = y + NB[t][2], x2 = x + NB[t][3];
                if (y1 < 0) y1 = 0;
                if (y1 > h - 1) y1 = h - 1;
                if (y2 < 0) y2 = 0;
                if (y2 > h - 1) y2 = h - 1;
                if (x1 < 0) x1 = 0;
                if (x1 > w - 1) x1 = w - 1;
                if (x2 < 0) x2 = 0;
                if (x2 > w - 1) x2 = w - 1;
                const int32_t a = src[(size_t)y1 * w + x1];
                const int32_t b = src[(size_t)y2 * w + x2];
                const int sa = (c > a) - (c < a);
                const int sb = (c > b) - (c < b);
                idx = sa + sb + 2;
            }
            int32_t v = c + tab[(size_t)crow[x] * 37 + idx];
            if (v < 0) v = 0;
            if (v > pel_max) v = pel_max;
            orow[x] = v;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_src);
    PyBuffer_Release(&b_dst);
    PyBuffer_Release(&b_typ);
    PyBuffer_Release(&b_cix);
    PyBuffer_Release(&b_tab);
    PyBuffer_Release(&b_mask);
    Py_RETURN_NONE;
}

/* cc_alf(luma y* int32[h*w], dst w* int32[hc*wc], h, w, hc, wc, sx, sy,
 *        coeff y* int32[hc*wc*7], off_rows y* int32[hc*3],
 *        skip y* uint8[hc], active y* uint8[hc*wc], bd)
 * Whole-plane CC-ALF correction from the pre-ALF luma.
 * Parity: filterBlkCcAlf / alf_np.filter_cc_frame (whole-picture clamp
 * windows). */
static PyObject *mod_cc_alf(PyObject *self, PyObject *args)
{
    Py_buffer b_luma, b_dst, b_co, b_off, b_skip, b_act;
    int h, w, hc, wc, sx, sy, bd;
    if (!PyArg_ParseTuple(args, "y*w*iiiiiiy*y*y*y*i", &b_luma, &b_dst,
                          &h, &w, &hc, &wc, &sx, &sy, &b_co, &b_off,
                          &b_skip, &b_act, &bd))
        return NULL;
    const int32_t *lum = (const int32_t *)b_luma.buf;
    int32_t *dst = (int32_t *)b_dst.buf;
    const int32_t *co = (const int32_t *)b_co.buf;
    const int32_t *offr = (const int32_t *)b_off.buf;
    const uint8_t *skip = (const uint8_t *)b_skip.buf;
    const uint8_t *act = (const uint8_t *)b_act.buf;
    const int pel_max = (1 << bd) - 1;
    const int half = (1 << bd) >> 1;
    Py_BEGIN_ALLOW_THREADS
    for (int yc = 0; yc < hc; yc++) {
        if (skip[yc])
            continue;
        const int ly = yc << sy;
        const int o1 = offr[yc * 3 + 0], o2 = offr[yc * 3 + 1],
                  o3 = offr[yc * 3 + 2];
#define ROW(dy) (lum + (size_t)((ly + (dy)) < 0 ? 0 : ((ly + (dy)) > h - 1 ? h - 1 : (ly + (dy)))) * w)
        const int32_t *r0 = ROW(0);
        const int32_t *r2 = ROW(o2);
        const int32_t *r1 = ROW(o1);
        const int32_t *r3 = ROW(o3);
#undef ROW
        int32_t *orow = dst + (size_t)yc * wc;
        const uint8_t *arow = act + (size_t)yc * wc;
        const int32_t *crow = co + (size_t)yc * wc * 7;
        for (int xc = 0; xc < wc; xc++) {
            if (!arow[xc])
                continue;
            const int lx = xc << sx;
            const int xm = lx - 1 < 0 ? 0 : lx - 1;
            const int xp = lx + 1 > w - 1 ? w - 1 : lx + 1;
            const int32_t curr = r0[lx];
            const int32_t *c7 = crow + (size_t)xc * 7;
            int64_t acc = (int64_t)c7[0] * (r2[lx] - curr)
                + (int64_t)c7[1] * (r0[xm] - curr)
                + (int64_t)c7[2] * (r0[xp] - curr)
                + (int64_t)c7[3] * (r1[xm] - curr)
                + (int64_t)c7[4] * (r1[lx] - curr)
                + (int64_t)c7[5] * (r1[xp] - curr)
                + (int64_t)c7[6] * (r3[lx] - curr);
            int32_t v = (int32_t)((acc + 64) >> 7);
            int32_t cl = v + half;
            if (cl < 0) cl = 0;
            if (cl > pel_max) cl = pel_max;
            v = cl - half + orow[xc];
            if (v < 0) v = 0;
            if (v > pel_max) v = pel_max;
            orow[xc] = v;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_luma);
    PyBuffer_Release(&b_dst);
    PyBuffer_Release(&b_co);
    PyBuffer_Release(&b_off);
    PyBuffer_Release(&b_skip);
    PyBuffer_Release(&b_act);
    Py_RETURN_NONE;
}

/* cc_alf2(luma y* int32[h*w], dst w* int32[hc*wc], h, w, hc, wc, sx, sy,
 *   banks y* int32[n*7], idx y* int32[hc*wc] (0 = off, else bank row),
 *   off_rows y* int32[hc*3], skip y* uint8[hc], bd)
 * Banked variant: indexes the CC-ALF coefficient bank per pixel instead
 * of taking a pre-expanded per-pixel coefficient plane. */
static PyObject *mod_cc_alf2(PyObject *self, PyObject *args)
{
    Py_buffer b_luma, b_dst, b_banks, b_idx, b_off, b_skip;
    int h, w, hc, wc, sx, sy, bd;
    if (!PyArg_ParseTuple(args, "y*w*iiiiiiy*y*y*y*i", &b_luma, &b_dst,
                          &h, &w, &hc, &wc, &sx, &sy, &b_banks, &b_idx,
                          &b_off, &b_skip, &bd))
        return NULL;
    const int32_t *lum = (const int32_t *)b_luma.buf;
    int32_t *dst = (int32_t *)b_dst.buf;
    const int32_t *banks = (const int32_t *)b_banks.buf;
    const int32_t *idx = (const int32_t *)b_idx.buf;
    const int32_t *offr = (const int32_t *)b_off.buf;
    const uint8_t *skip = (const uint8_t *)b_skip.buf;
    const int pel_max = (1 << bd) - 1;
    const int half = (1 << bd) >> 1;
    Py_BEGIN_ALLOW_THREADS
    for (int yc = 0; yc < hc; yc++) {
        if (skip[yc])
            continue;
        const int ly = yc << sy;
        const int o1 = offr[yc * 3 + 0], o2 = offr[yc * 3 + 1],
                  o3 = offr[yc * 3 + 2];
#define ROW(dy) (lum + (size_t)((ly + (dy)) < 0 ? 0 : ((ly + (dy)) > h - 1 ? h - 1 : (ly + (dy)))) * w)
        const int32_t *r0 = ROW(0);
        const int32_t *r2 = ROW(o2);
        const int32_t *r1 = ROW(o1);
        const int32_t *r3 = ROW(o3);
#undef ROW
        int32_t *orow = dst + (size_t)yc * wc;
        const int32_t *irow = idx + (size_t)yc * wc;
        for (int xc = 0; xc < wc; xc++) {
            const int32_t bi = irow[xc];
            if (!bi)
                continue;
            const int lx = xc << sx;
            const int xm = lx - 1 < 0 ? 0 : lx - 1;
            const int xp = lx + 1 > w - 1 ? w - 1 : lx + 1;
            const int32_t curr = r0[lx];
            const int32_t *c7 = banks + (size_t)bi * 7;
            int64_t acc = (int64_t)c7[0] * (r2[lx] - curr)
                + (int64_t)c7[1] * (r0[xm] - curr)
                + (int64_t)c7[2] * (r0[xp] - curr)
                + (int64_t)c7[3] * (r1[xm] - curr)
                + (int64_t)c7[4] * (r1[lx] - curr)
                + (int64_t)c7[5] * (r1[xp] - curr)
                + (int64_t)c7[6] * (r3[lx] - curr);
            int32_t v = (int32_t)((acc + 64) >> 7);
            int32_t cl = v + half;
            if (cl < 0) cl = 0;
            if (cl > pel_max) cl = pel_max;
            v = cl - half + orow[xc];
            if (v < 0) v = 0;
            if (v > pel_max) v = pel_max;
            orow[xc] = v;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&b_luma);
    PyBuffer_Release(&b_dst);
    PyBuffer_Release(&b_banks);
    PyBuffer_Release(&b_idx);
    PyBuffer_Release(&b_off);
    PyBuffer_Release(&b_skip);
    Py_RETURN_NONE;
}

static PyMethodDef module_methods[] = {
    {"cc_alf2", (PyCFunction)mod_cc_alf2, METH_VARARGS, NULL},
    {"cc_alf", (PyCFunction)mod_cc_alf, METH_VARARGS,
     "whole-plane CC-ALF correction from the pre-ALF luma"},
    {"sao_plane", (PyCFunction)mod_sao_plane, METH_VARARGS,
     "whole-plane SAO from per-pixel parameter maps"},
    {"alf_classify", (PyCFunction)mod_alf_classify, METH_VARARGS,
     "whole-frame 4x4 ALF classification"},
    {"alf_diamond", (PyCFunction)mod_alf_diamond, METH_VARARGS,
     "whole-frame clipped-diamond ALF (luma 12 / chroma 6 taps)"},
    {"deblock_luma", (PyCFunction)mod_deblock_luma, METH_VARARGS, NULL},
    {"deblock_chroma", (PyCFunction)mod_deblock_chroma, METH_VARARGS, NULL},
    {"deblock_filter_frame", (PyCFunction)mod_deblock_filter_frame,
     METH_VARARGS, NULL},
    {"alf_apply", (PyCFunction)mod_alf_apply, METH_VARARGS, NULL},
    {"sao_apply_frame", (PyCFunction)mod_sao_apply_frame, METH_VARARGS,
     NULL},
    {"deblock_strengths", (PyCFunction)mod_deblock_strengths, METH_VARARGS,
     "derive deblocking boundary strengths from walk records"},
    {"build_intra_td", (PyCFunction)mod_build_intra_td, METH_VARARGS,
     "build intra fast-path TU descriptors from walk records"},
    {"mc_block", (PyCFunction)mod_mc_block, METH_VARARGS,
     "motion-compensated block interpolation (N-tap separable FIR)"},
    {"itx_block", (PyCFunction)mod_itx_block, METH_VARARGS,
     "per-TU dequant + separable inverse transform"},
    {NULL},
};

static PyModuleDef cabacmodule = {
    PyModuleDef_HEAD_INIT, "_cabac",
    "native host plane: CABAC decoder + deblocking cell kernels", -1,
    module_methods,
};

PyMODINIT_FUNC PyInit__cabac(void)
{
    PyObject *m;
    if (PyType_Ready(&DecoderType) < 0)
        return NULL;
    if (PyType_Ready(&WalkType) < 0)
        return NULL;
    if (PyType_Ready(&MotionCtxType) < 0)
        return NULL;
    if (PyType_Ready(&InterCtxType) < 0)
        return NULL;
    m = PyModule_Create(&cabacmodule);
    if (!m)
        return NULL;
    Py_INCREF(&DecoderType);
    PyModule_AddObject(m, "Decoder", (PyObject *)&DecoderType);
    Py_INCREF(&MotionCtxType);
    PyModule_AddObject(m, "MotionCtx", (PyObject *)&MotionCtxType);
    Py_INCREF(&InterCtxType);
    PyModule_AddObject(m, "InterCtx", (PyObject *)&InterCtxType);
    PyModule_AddIntConstant(m, "INTER_PARAM_COUNT", IP_COUNT);
    PyModule_AddIntConstant(m, "INTER_SLICE_NF", IS_NF);
    PyModule_AddIntConstant(m, "WALK_PARAM_COUNT", WP_COUNT);
    PyModule_AddIntConstant(m, "WALK_CU_NF", CU_NF);
    PyModule_AddIntConstant(m, "WALK_TU_NF", TUF_NF);
    PyModule_AddIntConstant(m, "WALK_SAO_STRIDE", SAO_STRIDE);
    PyModule_AddIntConstant(m, "WALK_ALF_STRIDE", ALF_STRIDE);
    return m;
}
