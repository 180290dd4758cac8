"""Device (TPU) intra prediction: the whole-frame sequential intra chain
as ONE jitted lax.scan over prediction units in parse order.

This is the stage that forced reconstruction onto the host in earlier
designs (intra prediction reads the *reconstructed* neighbours, a raster
dependency a data-parallel device cannot batch away).  The TPU-native
resolution here:

  * The reference-sample *geometry* (availability, substitution,
    replication — xFillReferenceSamples, IntraPrediction.cpp:1161) is
    value-independent: it depends only on CU decode order and
    slice/tile/picture boundaries.  The host therefore compiles each
    prediction unit into a ~29-scalar descriptor whose fill rule is two
    clamped index runs into the recon plane; no pixel ever crosses back
    to the host mid-frame.
  * The device runs lax.scan over the descriptor rows, each step doing
    gather(refs) -> [1 2 1] smoothing -> planar/DC/angular(+PDPC)
    prediction on a padded 64x64 tile -> residual add/clip ->
    masked read-modify-write into the recon plane carried as scan state.

Bit-exact parity targets: IntraPrediction::predIntraAng
(/root/reference/source/Lib/CommonLib/IntraPrediction.cpp:471),
xFillReferenceSamples (:1161), xFilterReferenceSamples; the host golden
is frame/recon_np.py (fill_reference/pred_planar/pred_dc/pred_angular/
pdpc_dc_planar), itself oracle-validated against vvdecapp.

Covered tool set (frame falls back to the host plane otherwise, counted
in the fallback census): planar / DC / all angular modes incl. wide
angle, PDPC, reference smoothing, 4-tap cubic/gauss luma interpolation,
2-tap chroma interpolation, dual-tree, MIP (one-hot MXU matmuls), CCLM
(LM/LM-L/LM-T off the carried luma plane), CIIP blend, intra LMCS
(reshaped-domain scan + VPDU chroma-scale average + PWL inverse map),
and LFNST/MTS/transform-skip residuals (the device ITX stage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vvdec_tpu.ops.tables import (
    ANG_TABLE,
    CHROMA_FILTER,
    GAUSS_FILTER,
    INTRA_FILTER_THRESH,
    INV_ANG_TABLE,
)

B = 64     # max prediction block side (the padded compute tile)
PB = 64    # plane bottom/right padding (allows 64x64 RMW at any origin)
RL = 132   # reference array length (2*64+1 samples + filter margin)
D = 33     # descriptor row width

# descriptor row layout (int32):
#  0 comp; 1 x; 2 y; 3 w; 4 h; 5 log2w; 6 log2h;
#  7 mode_class (0 planar, 1 DC, 2 angular); 8 filtered ([1 2 1] refs);
#  9 cbf; 10 avail0 (no refs -> mid-grey);
#  top fill:  value(i) = plane[ty_a if i < ty_k else ty_b,
#                              clamp(tx0 + i, txlo, txhi)]
#  11 ty_a; 12 ty_b; 13 ty_k; 14 tx0; 15 txlo; 16 txhi;
#  left fill: value(j) = plane[clamp(ly0 + j, lylo, lyhi),
#                              lx_a if j < lx_k else lx_b]
#  17 lx_a; 18 lx_b; 19 lx_k; 20 ly0; 21 lylo; 22 lyhi;
#  23 is_ver; 24 angle (signed); 25 inv_angle;
#  26 frac_kind (0 integer, 1 cubic, 2 gauss, 3 chroma 2-tap);
#  27 do_pdpc; 28 valid (0 = padding row)
#  LMCS chroma residual scaling (calculateChromaAdjVpduNei):
#  29 flags: bit0 scale-this-unit, bit1 vpdu-left nb, bit2 vpdu-above nb;
#  30 x_pos; 31 y_pos (luma coords of the VPDU's top-left CU); 32 rsvd


def _bitlen(v, maxbits: int = 17):
    """int.bit_length for v >= 0 (exact, via compares)."""
    n = jnp.zeros((), dtype=jnp.int32)
    for m in range(maxbits):
        n = n + (v >= (1 << m)).astype(jnp.int32)
    return n


def _take1d(vec, idx):
    """vec[idx] for a small 1-D vector, as a one-hot matmul.

    Per-element gathers serialize on TPU (~8 ns/element) and vmapped /
    per-row dynamic slices lower to while loops; a one-hot [*, n] @ [n]
    contraction rides the MXU/VPU instead.  Exact: one product per
    output is nonzero, and sample values (< 2^16) are exact in f32."""
    oh = (idx[..., None] == jnp.arange(vec.shape[0])).astype(jnp.float32)
    return jnp.matmul(oh, vec.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST).astype(jnp.int32)


# ======================================================================
# LMCS on device (Reshape.cpp: rspCtuBcw inverse map, scaleSignal,
# calculateChromaAdjVpduNei; host golden frame/lmcs_np.py)
# ======================================================================
# lmcs parameter vector layout (int32, traced):
#  [0:17]  reshape_pivot (17)
#  [17:33] input_pivot (16)
#  [33:49] inv_scale (16)
#  [49:65] chroma_adj_lut (16)
#  [65] min_bin; [66] max_bin; [67] pic_h; [68] pic_w
LM_LEN = 69


def build_lmcs_params(reshaper, cs) -> np.ndarray:
    lm = np.zeros(LM_LEN, dtype=np.int32)
    lm[0:17] = reshaper.reshape_pivot
    lm[17:33] = reshaper.input_pivot[:16]
    lm[33:49] = reshaper.inv_scale
    lm[49:65] = reshaper.chroma_adj_lut
    lm[65] = reshaper.min_bin
    lm[66] = reshaper.max_bin
    lm[67] = cs.h
    lm[68] = cs.w
    return lm


def _sel16(lm, base: int, idx):
    """lm[base + idx] for a scalar/array idx over a 16/17-entry table
    (masked sum — no serialized gather)."""
    n = 17 if base == 0 else 16
    tab = lm[base:base + n]
    i = jnp.arange(n)
    return jnp.sum(jnp.where(idx[..., None] == i, tab, 0), axis=-1)


def _pwl_idx_inv_dev(v, lm):
    """getPWLIdxInv: first bin whose next pivot exceeds v (pivots are
    non-decreasing, so the walk equals min_bin + count of exceeded
    pivots in [min_bin, max_bin]), clipped to 15."""
    i = jnp.arange(16)
    pivots = lm[1:17]
    hit = (i >= lm[65]) & (i <= lm[66]) & (v[..., None] >= pivots)
    return jnp.minimum(lm[65] + jnp.sum(hit.astype(jnp.int32), axis=-1),
                       15)


def _scale_signal_dev(r, scale, bd: int):
    """AreaBuf::scaleSignal: sign-symmetric fixed-point residual scale."""
    max_abs = (1 << bd) - 1
    rc = jnp.clip(r, -max_abs - 1, max_abs)
    sign = jnp.where(rc >= 0, 1, -1)
    val = sign * ((sign * rc * scale + (1 << 10)) >> 11)
    return jnp.clip(val, -32768, 32767)


def _chroma_scale_dev(read_luma, d, lm, bd: int, num_nb: int):
    """calculateChromaAdjVpduNei on device: average the reconstructed
    (reshaped-domain) luma left/above the VPDU's top-left CU, then look
    up the chroma scale.  read_luma(r, c, h, w) is a dynamic-slice of
    the luma plane."""
    xpos, ypos = d[30], d[31]
    left_ok = (d[29] & 2) != 0
    above_ok = (d[29] & 4) != 0
    log_nb = num_nb.bit_length() - 1
    jv = jnp.arange(num_nb)
    colw = read_luma(ypos, jnp.maximum(xpos - 1, 0), num_nb, 1)[:, 0]
    lim = jnp.clip(lm[67] - ypos, 1, num_nb)
    wj = jnp.where(jv < lim - 1, 1,
                   jnp.where(jv == lim - 1, num_nb - lim + 1, 0))
    sum_l = jnp.sum(colw * wj)
    roww = read_luma(jnp.maximum(ypos - 1, 0), xpos, 1, num_nb)[0, :]
    limx = jnp.clip(lm[68] - xpos, 1, num_nb)
    wi = jnp.where(jv < limx - 1, 1,
                   jnp.where(jv == limx - 1, num_nb - limx + 1, 0))
    sum_t = jnp.sum(roww * wi)
    rec_sum = jnp.where(left_ok, sum_l, 0) + jnp.where(above_ok, sum_t, 0)
    pelnum = (jnp.where(left_ok, num_nb, 0)
              + jnp.where(above_ok, num_nb, 0))
    v1 = (rec_sum + (1 << (log_nb - 1))) >> log_nb
    v2 = (rec_sum + (1 << log_nb)) >> (log_nb + 1)
    luma_val = jnp.where(pelnum == num_nb, v1,
                         jnp.where(pelnum == 2 * num_nb, v2,
                                   1 << (bd - 1)))
    return _sel16(lm, 49, _pwl_idx_inv_dev(luma_val, lm))


def lmcs_inv_map(plane, lm, bd: int):
    """Inverse luma mapping (the RSP stage): piecewise-linear evaluation
    bit-equal to the host's inv_lut (built with the same formula)."""
    idx = _pwl_idx_inv_dev(plane, lm)
    piv = _sel16(lm, 0, idx)
    ipiv = _sel16(lm, 17, idx)
    isc = _sel16(lm, 33, idx)
    out = ipiv + ((isc * (plane - piv) + (1 << 10)) >> 11)
    return jnp.clip(out, 0, (1 << bd) - 1)


def _gather_refs(plane, d, bd: int, slice2d=None):
    """Reference arrays top[RL], left[RL] (index 0 = corner), already
    smoothed when the descriptor says so (xFillReferenceSamples +
    xFilterReferenceSamples).

    Reads the recon plane ONLY through lax.dynamic_slice windows (a
    2-row strip for the top run, a 2-column strip for the left run) and
    remaps the clamped fill indices inside the small window.  A
    fancy-index gather from the scan carry costs ~60 us/step on TPU (it
    defeats XLA's in-place carry analysis and forces whole-plane
    copies); slice reads keep the carry in place (~0.3 us/step).
    `slice2d(r, c, h, w)` and `dims` override the plane read (the
    stacked-plane wavefront slices P[d[0]]); both fill rows/cols are
    adjacent (ty_a, ty_b in {y-1, y}; lx_a, lx_b in {x-1, x}), so a
    2-wide strip always covers them.  Window starts are clamped here
    with the SAME rule lax.dynamic_slice applies, so the in-window
    remap indices stay consistent; planes must be >= (RL, RL)."""
    if slice2d is None:
        def slice2d(r, c, hh, ww):
            return lax.dynamic_slice(plane, (r, c), (hh, ww))
    dims = plane.shape
    hp, wp = dims[0], dims[1]
    i = jnp.arange(RL)
    # top run: value(i) = plane[ty(i), clip(tx0+i, txlo, txhi)] — the
    # clip output range [txlo, txhi] (span <= 2*64) bounds the window,
    # NOT tx0 (which may sit far outside it)
    rt0 = jnp.clip(jnp.minimum(d[11], d[12]), 0, hp - 2)
    ct0 = jnp.clip(d[15], 0, wp - RL)
    win_t = slice2d(rt0, ct0, 2, RL)
    row_a = jnp.where(d[11] == rt0, win_t[0], win_t[1])
    row_b = jnp.where(d[12] == rt0, win_t[0], win_t[1])
    jt = jnp.clip(d[14] + i, d[15], d[16]) - ct0
    top = jnp.where(i < d[13], _take1d(row_a, jt),
                    _take1d(row_b, jt)).astype(jnp.int32)
    # left run: value(j) = plane[clip(ly0+j, lylo, lyhi), lx(j)] — the
    # window starts at lylo (clip output range), not ly0
    rl0 = jnp.clip(d[21], 0, hp - RL)
    cl0 = jnp.clip(jnp.minimum(d[17], d[18]), 0, wp - 2)
    win_l = slice2d(rl0, cl0, RL, 2)
    col_a = jnp.where(d[17] == cl0, win_l[:, 0], win_l[:, 1])
    col_b = jnp.where(d[18] == cl0, win_l[:, 0], win_l[:, 1])
    jl = jnp.clip(d[20] + i, d[21], d[22]) - rl0
    left = jnp.where(i < d[19], _take1d(col_a, jl),
                     _take1d(col_b, jl)).astype(jnp.int32)
    dcv = 1 << (bd - 1)
    na = d[10] == 1
    top = jnp.where(na, dcv, top)
    left = jnp.where(na, dcv, left)
    # [1 2 1] smoothing; interior only, shared filtered corner
    w2 = 2 * d[3]
    h2 = 2 * d[4]
    tm1 = jnp.concatenate([top[:1], top[:-1]])
    tp1 = jnp.concatenate([top[1:], top[-1:]])
    lm1 = jnp.concatenate([left[:1], left[:-1]])
    lp1 = jnp.concatenate([left[1:], left[-1:]])
    c = (left[1] + 2 * top[0] + top[1] + 2) >> 2
    ft = jnp.where((i >= 1) & (i <= w2 - 1),
                   (tm1 + 2 * top + tp1 + 2) >> 2, top)
    ft = jnp.where(i == 0, c, ft)
    fl = jnp.where((i >= 1) & (i <= h2 - 1),
                   (lm1 + 2 * left + lp1 + 2) >> 2, left)
    fl = jnp.where(i == 0, c, fl)
    use_f = d[8] == 1
    return jnp.where(use_f, ft, top), jnp.where(use_f, fl, left)


def _pred_planar(top, left, d):
    w, h, l2w, l2h = d[3], d[4], d[5], d[6]
    xs = jnp.arange(B)[None, :]
    ys = jnp.arange(B)[:, None]
    topv = top[1:B + 1][None, :]
    leftv = left[1:B + 1][:, None]
    tr = top[w + 1]
    bl = left[h + 1]
    hor = (leftv << l2w) + (xs + 1) * (tr - leftv)
    ver = (topv << l2h) + (ys + 1) * (bl - topv)
    off = 1 << (l2w + l2h)
    return ((hor << l2h) + (ver << l2w) + off) >> (1 + l2w + l2h)


def _pred_dc(top, left, d):
    w, h, l2w, l2h = d[3], d[4], d[5], d[6]
    i = jnp.arange(RL)
    st = jnp.sum(jnp.where((i >= 1) & (i <= w), top, 0))
    sl = jnp.sum(jnp.where((i >= 1) & (i <= h), left, 0))
    s = jnp.where(w >= h, st, 0) + jnp.where(w <= h, sl, 0)
    shift = jnp.where(w == h, l2w + 1, jnp.maximum(l2w, l2h))
    dc = (s + (1 << jnp.maximum(shift - 1, 0))) >> shift
    return jnp.broadcast_to(dc, (B, B))


def _pdpc_dc_planar(pred, top, left, d):
    l2w, l2h = d[5], d[6]
    scale = jnp.maximum((l2w + l2h - 2) >> 2, 0)
    xs = jnp.arange(B)[None, :]
    ys = jnp.arange(B)[:, None]
    wt = 32 >> jnp.minimum(31, (2 * ys) >> scale)
    wl = 32 >> jnp.minimum(31, (2 * xs) >> scale)
    lv = left[1:B + 1][:, None]
    tv = top[1:B + 1][None, :]
    return pred + ((wl * (lv - pred) + wt * (tv - pred) + 32) >> 6)


H_OFF = 64           # refext negative-side extent (max side length)
RL2 = H_OFF + 128 + B + 4   # refext length: side ext + 2*64 main + taps


def _pred_angular(top, left, d, pel_max: int, cf, gf):
    """xPredIntraAng in the swapped (main-reference) space; transposed
    back for horizontal modes.

    TPU formulation: per-element fancy gathers serialize (~8 ns/elem →
    ~34 us per 64x64 read), so the reference row is assembled ONCE as a
    clamped extended array refext[j] = main[clip(j-H_OFF, 0, 2wp)] (or
    the inverse-angle side projection for j < H_OFF, xPredIntraAng's
    refMain assembly), and each output row's taps come from ONE
    contiguous dynamic-slice window W[y] = refext[H_OFF+min(di,2wp) ..
    +B+3].  The per-element clamp and the window replication agree
    because refext itself replicates main[2wp] past its end."""
    w, h, l2w, l2h = d[3], d[4], d[5], d[6]
    is_ver = d[23] == 1
    wp = jnp.where(is_ver, w, h)
    hp = jnp.where(is_ver, h, w)
    l2wp = jnp.where(is_ver, l2w, l2h)
    l2hp = jnp.where(is_ver, l2h, l2w)
    main = jnp.where(is_ver, top, left)
    side = jnp.where(is_ver, left, top)
    angle = d[24]
    inv = d[25]
    ys = jnp.arange(B)[:, None]
    xs = jnp.arange(B)[None, :]
    delta = angle * (jnp.arange(B) + 1)
    di = delta >> 5                       # [B] per-row integer offset
    frac = (delta & 31)[:, None]

    jj = jnp.arange(RL2)
    m = jj - H_OFF
    mains = _take1d(main, jnp.clip(m, 0, 2 * wp))
    sidx = jnp.clip(jnp.minimum(((-m) * inv + 256) >> 9, hp), 0, RL - 1)
    refext = jnp.where(m < 0, _take1d(side, sidx), mains)
    # refmat[j, u] = refext[j + u] (static shifts); row windows become a
    # one-hot [B, RL2] @ [RL2, B+4] matmul — per-row dynamic slices
    # would lower to a 64-iteration while loop on TPU
    refpad = jnp.concatenate([refext, jnp.zeros(B + 4, jnp.int32)])
    refmat = jnp.stack([refpad[u:u + RL2] for u in range(B + 4)], axis=1)
    starts = H_OFF + jnp.minimum(di, 2 * wp)
    ohs = (starts[:, None] == jnp.arange(RL2)).astype(jnp.float32)
    wnd = jnp.matmul(ohs, refmat.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST).astype(jnp.int32)
    # wnd[y, u] = refext[H_OFF + min(di[y], 2wp) + u]; t0=di+1+x -> u=x+1

    def k_int(_):
        return wnd[:, 1:B + 1]

    def four_tap(tab):
        ohf = (frac[:, 0, None] == jnp.arange(32)).astype(jnp.float32)
        co = jnp.matmul(ohf, tab.astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) \
            .astype(jnp.int32)
        return (co[:, 0:1] * wnd[:, 0:B] + co[:, 1:2] * wnd[:, 1:B + 1]
                + co[:, 2:3] * wnd[:, 2:B + 2]
                + co[:, 3:4] * wnd[:, 3:B + 3] + 32) >> 6

    def k_cubic(_):
        return jnp.clip(four_tap(cf), 0, pel_max)

    def k_gauss(_):
        return four_tap(gf)

    def k_chroma(_):
        return ((32 - frac) * wnd[:, 1:B + 1] + frac * wnd[:, 2:B + 2]
                + 16) >> 5

    dst = lax.switch(jnp.clip(d[26], 0, 3),
                     [k_int, k_cubic, k_gauss, k_chroma], 0)

    do_pdpc = d[27] == 1
    # positive-angle PDPC (side projection weights): lv[y, x] =
    # side[min(y + g(x), 2hp)] — assembled from a tail-replicated side
    # array with one contiguous window per COLUMN, then transposed
    scale_a = jnp.minimum(2, l2hp - (_bitlen(3 * inv - 2) - 1 - 8))
    sa = jnp.clip(scale_a, 0, 31)
    nx = jnp.minimum(3 << sa, wp)
    g = ((256 + inv * (jnp.arange(B) + 1)) >> 9) + 1   # [B] per column
    wl = 32 >> jnp.minimum(31, (2 * xs) >> sa)
    next_ = 128 + B + 1
    sideext = _take1d(side, jnp.clip(jnp.minimum(jnp.arange(next_),
                                                 2 * hp), 0, RL - 1))
    sidepad = jnp.concatenate([sideext, jnp.zeros(B, jnp.int32)])
    sidemat = jnp.stack([sidepad[u:u + next_] for u in range(B)], axis=1)
    gs = jnp.clip(g, 0, next_ - B)
    ohg = (gs[:, None] == jnp.arange(next_)).astype(jnp.float32)
    lvt = jnp.matmul(ohg, sidemat.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST).astype(jnp.int32)
    lv = lvt.T
    add = (wl * (lv - dst) + 32) >> 6
    m_pos = do_pdpc & (angle > 0) & (scale_a >= 0) & (xs < nx)
    dst = jnp.where(m_pos, dst + add, dst)
    # pure hor/ver PDPC (angle == 0): refmain(1+xs) = refext[H_OFF+1+x]
    scale0 = jnp.maximum((l2wp + l2hp - 2) >> 2, 0)
    lev = jnp.minimum(3 << scale0, wp)
    wl0 = 32 >> jnp.minimum(31, (2 * xs) >> scale0)
    corner = side[0]
    mrow = refext[H_OFF + 1:H_OFF + 1 + B][None, :]
    v0 = jnp.clip((wl0 * (left_of(side) - corner) + mrow * 64
                   + 32) >> 6, 0, pel_max)
    m0 = do_pdpc & (angle == 0) & (xs < lev)
    dst = jnp.where(m0, v0, dst)
    return jnp.where(is_ver, dst, dst.T)


def left_of(side):
    """side[1..B] as a column (static slice, not an iota gather)."""
    return side[1:B + 1][:, None]


def _pred_mip(top, left, d, bd: int, m4, m8, m16):
    """Matrix intra prediction on the MXU: Haar boundary downsample,
    rebased matrix product per size class, linear upsampling.  Parity:
    Mip::PredictorMIP (MatrixIntraPrediction.cpp:60) / recon_np.pred_mip.
    Descriptor reuse: d[24]=mip mode, d[25]=transpose, d[26]=size id."""
    w, h, l2w, l2h = d[3], d[4], d[5], d[6]
    mode = d[24]
    transpose = d[25] == 1
    sid = d[26]
    pel_max = (1 << bd) - 1
    i64 = jnp.arange(B)
    ref_top = top[1:B + 1]
    ref_left = left[1:B + 1]
    # Haar downsample to bdry boundary samples per side (masked group
    # sums; lgf == 0 means copy)
    log2bdry = jnp.where(sid == 0, 1, 2)
    bdry = 1 << log2bdry
    lgf_w = jnp.maximum(l2w - log2bdry, 0)
    lgf_h = jnp.maximum(l2h - log2bdry, 0)
    g4 = jnp.arange(4)[:, None]
    mask_w = ((i64 >> lgf_w)[None, :] == g4) & (i64[None, :] < w)
    sums_t = jnp.sum(jnp.where(mask_w, ref_top[None, :], 0), axis=1)
    t_red = jnp.where(
        lgf_w > 0,
        (sums_t + (1 << jnp.maximum(lgf_w - 1, 0))) >> lgf_w, sums_t)
    mask_h = ((i64 >> lgf_h)[None, :] == g4) & (i64[None, :] < h)
    sums_l = jnp.sum(jnp.where(mask_h, ref_left[None, :], 0), axis=1)
    l_red = jnp.where(
        lgf_h > 0,
        (sums_l + (1 << jnp.maximum(lgf_h - 1, 0))) >> lgf_h, sums_l)
    # rebased input vector [8] (first 2*bdry entries valid)
    k8 = jnp.arange(8)
    bound = jnp.where(k8 < bdry, t_red[jnp.clip(k8, 0, 3)],
                      l_red[jnp.clip(k8 - bdry, 0, 3)])
    bound_t = jnp.where(k8 < bdry, l_red[jnp.clip(k8, 0, 3)],
                        t_red[jnp.clip(k8 - bdry, 0, 3)])
    inp0 = jnp.where(transpose, bound_t, bound)
    in_off = inp0[0]
    first = jnp.where(sid < 2, (1 << (bd - 1)) - in_off, 0)
    inp = jnp.where(k8 == 0, first, inp0 - in_off)
    inp = jnp.where(k8 < 2 * bdry, inp, 0)
    offset = 32 - 32 * jnp.sum(inp)

    def mm(matm, src):
        acc = jnp.einsum("pi,i->p", matm, src,
                         preferred_element_type=jnp.int32)
        return jnp.clip(((acc + offset) >> 6) + in_off, 0, pel_max)

    def mm4(_):
        o = mm(m4[jnp.clip(mode, 0, 15)], inp[:4])
        return jnp.zeros((8, 8), jnp.int32).at[:4, :4].set(
            o.reshape(4, 4))

    def mm8(_):
        o = mm(m8[jnp.clip(mode, 0, 7)], inp[:8])
        return jnp.zeros((8, 8), jnp.int32).at[:4, :4].set(
            o.reshape(4, 4))

    def mm16(_):
        o = mm(m16[jnp.clip(mode, 0, 5)], inp[1:8])
        return o.reshape(8, 8)

    pred = lax.switch(jnp.clip(sid, 0, 2), [mm4, mm8, mm16], 0)
    pred = jnp.where(transpose, pred.T, pred)
    # linear upsampling (formula degrades to copy when up == 1)
    log2red = jnp.where(sid < 2, 2, 3)
    lg_h = jnp.maximum(l2w - log2red, 0)
    lg_v = jnp.maximum(l2h - log2red, 0)
    up_h = 1 << lg_h
    up_v = 1 << lg_v
    # upsampling reads are separable (row index from y, column index
    # from x): use per-axis one-hot matmuls, not [B, B] gathers (which
    # serialize per element on TPU)
    xs = i64[None, :]
    ks = i64[:, None]
    j = xs >> lg_h
    i_ = xs & (up_h - 1)
    ohr8 = (jnp.clip(i64, 0, 7)[:, None]
            == jnp.arange(8)).astype(jnp.float32)
    ohc = (jnp.clip(i64 >> lg_h, 0, 7)[:, None]
           == jnp.arange(8)).astype(jnp.float32)
    ohc1 = (jnp.clip((i64 >> lg_h) - 1, 0, 7)[:, None]
            == jnp.arange(8)).astype(jnp.float32)
    predf = pred.astype(jnp.float32)
    rowsel = jnp.matmul(ohr8, predf,
                        preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)  # [B, 8]
    bh = jnp.matmul(rowsel, ohc.T,
                    preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST).astype(jnp.int32)
    pv_in = jnp.matmul(rowsel, ohc1.T,
                       preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) \
        .astype(jnp.int32)
    pv0 = _take1d(left, jnp.clip((ks[:, 0] + 1) * up_v, 0, RL - 1))
    pv = jnp.where(j == 0, pv0[:, None], pv_in)
    ro_h = jnp.where(lg_h > 0, 1 << jnp.maximum(lg_h - 1, 0), 0)
    hor = (pv * up_h + ro_h + (i_ + 1) * (bh - pv)) >> lg_h
    ys = i64[:, None]
    iv = ys & (up_v - 1)
    ohrv = (jnp.clip(i64 >> lg_v, 0, B - 1)[:, None]
            == jnp.arange(B)).astype(jnp.float32)
    ohrv1 = (jnp.clip((i64 >> lg_v) - 1, 0, B - 1)[:, None]
             == jnp.arange(B)).astype(jnp.float32)
    horf = hor.astype(jnp.float32)
    bh2 = jnp.matmul(ohrv, horf,
                     preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST).astype(jnp.int32)
    pv2_in = jnp.matmul(ohrv1, horf,
                        preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST) \
        .astype(jnp.int32)
    pv2 = jnp.where(ys >> lg_v == 0, top[1:B + 1][None, :], pv2_in)
    ro_v = jnp.where(lg_v > 0, 1 << jnp.maximum(lg_v - 1, 0), 0)
    return (pv2 * up_v + ro_v + (iv + 1) * (bh2 - pv2)) >> lg_v


_CCLM_DIV = (0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 1, 1, 0)


def _pred_cclm(top, left, d, luma, bd: int, cfmt: int, collocated: bool,
               ctu_log2: int):
    """Cross-component linear model chroma prediction on device: 4-point
    template sampling off the device luma recon, min/max parameter fit,
    dense downsample + linear transform.  Parity: recon_np.pred_cclm
    (xGetLumaRecPixels/xGetLMParameters/predIntraChromaLM).  Descriptor
    reuse (mode_class 4): d[27]=build_above, d[23]=build_left,
    d[24]=actual_top, d[25]=actual_left, d[26]=above|left<<1 avail
    (d[8] stays 0 — CCLM reference samples are never smoothed)."""
    pel_max = (1 << bd) - 1
    cx, cy, cw, ch = d[1], d[2], d[3], d[4]
    build_above = d[27] == 1
    build_left = d[23] == 1
    actual_top = d[24]
    actual_left = d[25]
    above_avail = (d[26] & 1) == 1
    left_avail = (d[26] & 2) == 2
    sub_w = 2 if cfmt in (1, 2) else 1
    sub_h = 2 if cfmt == 1 else 1
    mult, rec2 = sub_w, sub_h
    stro = 0 if sub_w == 1 else 1
    lh = luma.shape[0] - PB
    lw = luma.shape[1] - PB
    lx, ly = cx * sub_w, cy * sub_h
    first_row = (ly & ((1 << ctu_log2) - 1)) == 0
    if cfmt == 2:      # 4:2:2
        t3 = (2, 1, 1, 2, 2)
        t5 = (0, 2, 1, 1, 0, 2, 2)
        t6 = (2, 1, 1, 0, 0, 0, 2, 2)
    elif cfmt == 3:    # 4:4:4
        t3 = (1, 0, 0, 0, 0)
        t5 = (0, 1, 0, 0, 0, 0, 0)
        t6 = (1, 0, 0, 0, 0, 0, 0, 0)
    else:              # 4:2:0
        t3 = (2, 1, 1, 2, 2)
        t5 = (1, 4, 1, 1, 1, 4, 3)
        t6 = (2, 1, 1, 2, 1, 1, 4, 3)

    def lum(r, c):
        # host-golden index semantics: negative wraps (python indexing),
        # upper clamps to the picture edge
        r = jnp.where(r < 0, r + lh, r)
        c = jnp.where(c < 0, c + lw, c)
        return luma[jnp.minimum(r, lh - 1), jnp.minimum(c, lw - 1)] \
            .astype(jnp.int32)

    def ds_top(i):
        xx = lx + mult * i
        left_tap = jnp.where((i == 0) & ~build_left, xx, xx - 1)
        r3 = ly - 1
        v3 = (t3[0] * lum(r3, xx) + t3[1] * lum(r3, left_tap)
              + t3[2] * lum(r3, xx + 1) + t3[3]) >> t3[4]
        r = ly - rec2
        v5 = (t5[0] * lum(r - stro, xx) + t5[1] * lum(r, xx)
              + t5[2] * lum(r, left_tap) + t5[3] * lum(r, xx + 1)
              + t5[4] * lum(r + stro, xx) + t5[5]) >> t5[6]
        v6 = (t6[0] * lum(r, xx) + t6[1] * lum(r, left_tap)
              + t6[2] * lum(r, xx + 1) + t6[3] * lum(r + stro, xx)
              + t6[4] * lum(r + stro, left_tap)
              + t6[5] * lum(r + stro, xx + 1) + t6[6]) >> t6[7]
        vn = v5 if collocated else v6
        return jnp.where(first_row, v3, vn)

    def ds_left(j):
        yy = ly + rec2 * j
        base = lx - 2 - (sub_w - 1)
        if collocated:
            top_tap = jnp.where((j == 0) & ~build_above, yy, yy - stro)
            return (t5[0] * lum(top_tap, base + 1)
                    + t5[1] * lum(yy, base + 1) + t5[2] * lum(yy, base)
                    + t5[3] * lum(yy, base + 2)
                    + t5[4] * lum(yy + stro, base + 1) + t5[5]) >> t5[6]
        return (t6[0] * lum(yy, base + 1) + t6[1] * lum(yy, base)
                + t6[2] * lum(yy, base + 2)
                + t6[3] * lum(yy + stro, base + 1)
                + t6[4] * lum(yy + stro, base)
                + t6[5] * lum(yy + stro, base + 2) + t6[6]) >> t6[7]

    above_is4 = jnp.where(left_avail, 0, 1)
    left_is4 = jnp.where(above_avail, 0, 1)
    start_t = actual_top >> (2 + above_is4)
    step_t = jnp.maximum(1, actual_top >> (1 + above_is4))
    start_l = actual_left >> (2 + left_is4)
    step_l = jnp.maximum(1, actual_left >> (1 + left_is4))
    cnt_t = jnp.where(above_avail,
                      jnp.minimum(actual_top, (1 + above_is4) << 1), 0)
    cnt_l = jnp.where(left_avail,
                      jnp.minimum(actual_left, (1 + left_is4) << 1), 0)
    k4 = jnp.arange(4)
    pos_t = start_t + k4 * step_t
    pos_l = start_l + jnp.maximum(k4 - cnt_t, 0) * step_l
    lum_t = ds_top(pos_t)
    chr_t = top[jnp.clip(1 + pos_t, 0, RL - 1)]
    lum_l = ds_left(pos_l)
    chr_l = left[jnp.clip(1 + pos_l, 0, RL - 1)]
    use_t = k4 < cnt_t
    use_l = (k4 >= cnt_t) & (k4 < cnt_t + cnt_l)
    sel_l = jnp.where(use_t, lum_t, jnp.where(use_l, lum_l, 0))
    sel_c = jnp.where(use_t, chr_t, jnp.where(use_l, chr_l, 0))
    cnt = cnt_t + cnt_l
    # cnt == 2: duplicate the pair ([1], [0], [1], [0])
    two = cnt == 2
    sel_l = jnp.where(two, sel_l[jnp.asarray((1, 0, 1, 0))], sel_l)
    sel_c = jnp.where(two, sel_c[jnp.asarray((1, 0, 1, 0))], sel_c)
    # min/max grouping (xGetLMParameters sorting network)
    la, lb, lc, ld = sel_l[0], sel_l[1], sel_l[2], sel_l[3]
    ca, cb, cc, cd = sel_c[0], sel_c[1], sel_c[2], sel_c[3]
    # min group (0, 2), max group (1, 3)
    m0l, m0c, m1l, m1c = la, ca, lc, cc
    x0l, x0c, x1l, x1c = lb, cb, ld, cd

    def swap(cond, a, b):
        return (jnp.where(cond, b[0], a[0]), jnp.where(cond, b[1], a[1]),
                jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))

    m0l, m0c, m1l, m1c = swap(m0l > m1l, (m0l, m0c), (m1l, m1c))
    x0l, x0c, x1l, x1c = swap(x0l > x1l, (x0l, x0c), (x1l, x1c))
    c_sw = m0l > x1l
    m0l, m0c, x0l, x0c, m1l, m1c, x1l, x1c = (
        jnp.where(c_sw, x0l, m0l), jnp.where(c_sw, x0c, m0c),
        jnp.where(c_sw, m0l, x0l), jnp.where(c_sw, m0c, x0c),
        jnp.where(c_sw, x1l, m1l), jnp.where(c_sw, x1c, m1c),
        jnp.where(c_sw, m1l, x1l), jnp.where(c_sw, m1c, x1c))
    c2 = m1l > x0l
    m1l, m1c, x0l, x0c = (jnp.where(c2, x0l, m1l), jnp.where(c2, x0c, m1c),
                          jnp.where(c2, m1l, x0l), jnp.where(c2, m1c, x0c))
    min_l = (m0l + m1l + 1) >> 1
    min_c = (m0c + m1c + 1) >> 1
    max_l = (x0l + x1l + 1) >> 1
    max_c = (x0c + x1c + 1) >> 1

    diff = max_l - min_l
    diff_c = max_c - min_c
    xsh = _bitlen(jnp.maximum(diff, 0)) - 1
    norm_diff = ((diff << 4) >> jnp.clip(xsh, 0, 31)) & 15
    v = jnp.asarray(_CCLM_DIV, dtype=jnp.int32)[norm_diff] | 8
    xsh = xsh + (norm_diff != 0).astype(jnp.int32)
    ysh = jnp.where(diff_c == 0, 0, _bitlen(jnp.abs(diff_c)) - 1 + 1)
    add = (1 << jnp.clip(ysh, 0, 31)) >> 1
    a = (diff_c * v + add) >> jnp.clip(ysh, 0, 31)
    shift = 3 + xsh - ysh
    a = jnp.where(shift < 1,
                  jnp.where(a == 0, 0, jnp.where(a < 0, -15, 15)), a)
    shift = jnp.maximum(shift, 1)
    b = min_c - ((a * min_l) >> shift)
    any_av = left_avail | above_avail
    a = jnp.where(any_av & (diff > 0), a, 0)
    b = jnp.where(any_av, jnp.where(diff > 0, b, min_c),
                  1 << (bd - 1))
    shift = jnp.where(any_av & (diff > 0), shift, 0)

    # dense downsampled luma + linear transform on the chroma grid
    iv = jnp.arange(B)[None, :]
    jv = jnp.arange(B)[:, None]
    yy = ly + rec2 * jv
    xx = lx + mult * iv
    if collocated:
        left_tap = jnp.where((iv == 0) & ~build_left, xx, xx - 1)
        top_tap = jnp.where((jv == 0) & ~build_above, yy, yy - stro)
        ds = (t5[0] * lum(top_tap, xx) + t5[1] * lum(yy, xx)
              + t5[2] * lum(yy, left_tap) + t5[3] * lum(yy, xx + 1)
              + t5[4] * lum(yy + stro, xx) + t5[5]) >> t5[6]
    else:
        lx0 = jnp.where((iv == 0) & ~build_left,
                        xx, jnp.maximum(xx - 1, 0))
        xs1 = jnp.minimum(xx + 1, lw - 1)
        ds = (t6[0] * lum(yy, xx) + t6[1] * lum(yy, lx0)
              + t6[2] * lum(yy, xs1) + t6[3] * lum(yy + stro, xx)
              + t6[4] * lum(yy + stro, lx0)
              + t6[5] * lum(yy + stro, xs1) + t6[6]) >> t6[7]
    return jnp.clip(b + ((a * ds) >> shift), 0, pel_max)


def _make_unit_kernels(bd: int, cfmt: int, collocated: bool, ctu_log2: int,
                       cf, gf):
    """The 6 per-unit prediction kernels, each
    (top, left, plane, luma, d) -> (B, B) predicted block (pre-residual).
    Shared by the sequential scan and the wavefront-batched scan."""
    pel_max = (1 << bd) - 1
    from vvdec_tpu.ops.tables import MIP_4x4, MIP_8x8, MIP_16x16
    m4 = jnp.asarray(MIP_4x4, dtype=jnp.int32)
    m8 = jnp.asarray(MIP_8x8, dtype=jnp.int32)
    m16 = jnp.asarray(MIP_16x16, dtype=jnp.int32)

    def k_planar(top, left, plane, luma, d):
        p = _pred_planar(top, left, d)
        return jnp.where(d[27] == 1, _pdpc_dc_planar(p, top, left, d), p)

    def k_dc(top, left, plane, luma, d):
        p = _pred_dc(top, left, d)
        return jnp.where(d[27] == 1, _pdpc_dc_planar(p, top, left, d), p)

    def k_ang(top, left, plane, luma, d):
        return _pred_angular(top, left, d, pel_max, cf, gf)

    def k_mip(top, left, plane, luma, d):
        return _pred_mip(top, left, d, bd, m4, m8, m16)

    def k_cclm(top, left, plane, luma, d):
        return _pred_cclm(top, left, d, luma, bd, cfmt, collocated,
                          ctu_log2)

    def k_ciip(top, left, plane, luma, d):
        # planar intra blended 1:3..3:1 with the RAW inter pred the
        # MC stage left in the plane (d[24]=w_intra, d[25]=w_merge)
        p = _pred_planar(top, left, d)
        p = jnp.where(d[27] == 1, _pdpc_dc_planar(p, top, left, d), p)
        cur = lax.dynamic_slice(plane, (d[2], d[1]), (B, B))
        return (d[25] * cur + d[24] * p + 2) >> 2

    return [k_planar, k_dc, k_ang, k_mip, k_cclm, k_ciip]


def _make_unit_update(bd: int, cfmt: int, collocated: bool, ctu_log2: int,
                      cf, gf, has_lmcs: bool = False):
    """One prediction unit's gather -> predict -> reconstruct -> RMW."""
    pel_max = (1 << bd) - 1
    kernels = _make_unit_kernels(bd, cfmt, collocated, ctu_log2, cf, gf)
    num_nb = min(64, 1 << ctu_log2)

    def update(plane, luma, resi, d, lm=None):
        top, left = _gather_refs(plane, d, bd)
        blk = lax.switch(
            jnp.clip(d[7], 0, 5),
            [lambda _, k=k: k(top, left, plane, luma, d) for k in kernels],
            0)
        x, y = d[1], d[2]
        r = lax.dynamic_slice(resi, (y, x), (B, B))
        if has_lmcs:
            def rl(rr, cc, sh, sw):
                return lax.dynamic_slice(luma, (rr, cc), (sh, sw))

            scale = _chroma_scale_dev(rl, d, lm, bd, num_nb)
            r = jnp.where((d[29] & 1) == 1,
                          _scale_signal_dev(r, scale, bd), r)
        out = jnp.clip(blk + jnp.where(d[9] == 1, r, 0), 0, pel_max)
        cur = lax.dynamic_slice(plane, (y, x), (B, B))
        ys = jnp.arange(B)[:, None]
        xs = jnp.arange(B)[None, :]
        m = (ys < d[4]) & (xs < d[3]) & (d[28] == 1)
        return lax.dynamic_update_slice(
            plane, jnp.where(m, out, cur).astype(plane.dtype), (y, x))

    return update


@functools.lru_cache(maxsize=None)
def _intra_scan_fn(bd: int, cfmt: int = 1, collocated: bool = True,
                   ctu_log2: int = 7, has_lmcs: bool = False):
    """Jitted scan over descriptor rows carrying the (padded) recon
    planes; the per-plane shapes specialize at trace time.  The chroma
    branches receive the luma plane too (CCLM reads the co-located
    reconstructed luma)."""
    cf = jnp.asarray(CHROMA_FILTER, dtype=jnp.int32)
    gf = jnp.asarray(GAUSS_FILTER, dtype=jnp.int32)
    upd = _make_unit_update(bd, cfmt, collocated, ctu_log2, cf, gf,
                            has_lmcs)

    @jax.jit
    def run(planes, resis, desc, lm):
        # the slice-window reference fill needs planes >= (RL, RL)
        # (tiny pictures / dummy mono chroma planes)
        shapes = [p.shape for p in planes]
        planes = [jnp.pad(p, ((0, max(RL - p.shape[0], 0)),
                              (0, max(RL - p.shape[1], 0))))
                  for p in planes]
        resis = [jnp.pad(r, ((0, max(RL - r.shape[0], 0)),
                             (0, max(RL - r.shape[1], 0))))
                 for r in resis]

        def step(carry, d):
            def b0(c):
                return (upd(c[0], c[0], resis[0], d, lm), c[1], c[2])

            def b1(c):
                return (c[0], upd(c[1], c[0], resis[1], d, lm), c[2])

            def b2(c):
                return (c[0], c[1], upd(c[2], c[0], resis[2], d, lm))

            return lax.switch(jnp.clip(d[0], 0, 2), [b0, b1, b2],
                              carry), 0

        carry, _ = lax.scan(step, tuple(planes), desc)
        return tuple(p[:s[0], :s[1]] for p, s in zip(carry, shapes))

    return run


@functools.lru_cache(maxsize=None)
def _intra_wavefront_fn(bd: int, cfmt: int, collocated: bool,
                        ctu_log2: int, K: int, has_lmcs: bool = False):
    """Wavefront-batched intra chain: lax.scan over dependency levels,
    each step reconstructing up to K *independent* units at once
    (vmapped gather -> predict -> residual add, K dynamic block
    writes into a [3, H, W] stacked plane carry — a single array, so a
    step can mix luma and chroma units without control-flow branches).

    The host groups units by exact dependency level (compute_unit_levels
    — a unit's level is 1 + the max level over every recon cell its
    reference-fill runs read), so units inside one step never read each
    other's output: results are bit-identical to the sequential scan.
    This replaces ~#units sequential scan steps with ~#levels batched
    steps — the TPU-native answer to the reference's intra raster
    dependency (ctuTask INTRA stage, DecLibRecon.cpp:876-893)."""
    cf = jnp.asarray(CHROMA_FILTER, dtype=jnp.int32)
    gf = jnp.asarray(GAUSS_FILTER, dtype=jnp.int32)
    pel_max = (1 << bd) - 1
    from vvdec_tpu.ops.tables import MIP_4x4, MIP_8x8, MIP_16x16
    m4 = jnp.asarray(MIP_4x4, dtype=jnp.int32)
    m8 = jnp.asarray(MIP_8x8, dtype=jnp.int32)
    m16 = jnp.asarray(MIP_16x16, dtype=jnp.int32)
    num_nb = min(64, 1 << ctu_log2)

    @jax.jit
    def run(planes, resis, batches, lm):
        hh = max(max(p.shape[0] for p in planes), RL)
        ww = max(max(p.shape[1] for p in planes), RL)
        P = jnp.stack([jnp.pad(p, ((0, hh - p.shape[0]),
                                   (0, ww - p.shape[1]))) for p in planes])
        R = jnp.stack([jnp.pad(r, ((0, hh - r.shape[0]),
                                   (0, ww - r.shape[1]))) for r in resis])
        iy = jnp.arange(B)[:, None]
        ix = jnp.arange(B)[None, :]

        def step(P, db):
            def unit_refs(d):
                def s2(r, c, sh, sw):
                    return lax.dynamic_slice(P, (d[0], r, c),
                                             (1, sh, sw))[0]

                return _gather_refs(P[0], d, bd, slice2d=s2)

            tops, lefts = jax.vmap(unit_refs)(db)

            def k_planar(t, l, d):
                p = _pred_planar(t, l, d)
                return jnp.where(d[27] == 1,
                                 _pdpc_dc_planar(p, t, l, d), p)

            def k_dc(t, l, d):
                p = _pred_dc(t, l, d)
                return jnp.where(d[27] == 1,
                                 _pdpc_dc_planar(p, t, l, d), p)

            def k_ang(t, l, d):
                return _pred_angular(t, l, d, pel_max, cf, gf)

            def k_mip(t, l, d):
                return _pred_mip(t, l, d, bd, m4, m8, m16)

            def k_cclm(t, l, d):
                # materialize the luma plane only on CCLM steps (a slice
                # COPY: its gathers then read the copy, not the scan
                # carry, keeping the carry update in place)
                return _pred_cclm(t, l, d, P[0], bd, cfmt, collocated,
                                  ctu_log2)

            def k_ciip(t, l, d):
                p = _pred_planar(t, l, d)
                p = jnp.where(d[27] == 1, _pdpc_dc_planar(p, t, l, d), p)
                cur = lax.dynamic_slice(P, (d[0], d[2], d[1]),
                                        (1, B, B))[0]
                return (d[25] * cur + d[24] * p + 2) >> 2

            kernels = [k_planar, k_dc, k_ang, k_mip, k_cclm, k_ciip]

            def branch(k):
                return lambda _: jax.vmap(kernels[k])(tops, lefts, db)

            # batches are homogeneous in mode_class: the switch is on a
            # per-step scalar, so only one kernel family runs per step
            blk = lax.switch(jnp.clip(db[0, 7], 0, 5),
                             [branch(k) for k in range(6)], 0)
            r = jax.vmap(
                lambda d: lax.dynamic_slice(R, (d[0], d[2], d[1]),
                                            (1, B, B))[0])(db)
            if has_lmcs:
                def unit_scale(d):
                    def rl(rr, cc, sh, sw):
                        return lax.dynamic_slice(P, (0, rr, cc),
                                                 (1, sh, sw))[0]

                    return _chroma_scale_dev(rl, d, lm, bd, num_nb)

                scales = jax.vmap(unit_scale)(db)
                rs = jax.vmap(
                    lambda rr, s: _scale_signal_dev(rr, s, bd))(r, scales)
                r = jnp.where((db[:, 29, None, None] & 1) == 1, rs, r)
            cbf = (db[:, 9] == 1)[:, None, None]
            out = jnp.clip(blk + jnp.where(cbf, r, 0), 0, pel_max)

            def wr(k, p):
                d = db[k]
                cur = lax.dynamic_slice(p, (d[0], d[2], d[1]), (1, B, B))
                m = (iy < d[4]) & (ix < d[3]) & (d[28] == 1)
                upd = jnp.where(m, out[k], cur[0]).astype(p.dtype)
                return lax.dynamic_update_slice(p, upd[None],
                                                (d[0], d[2], d[1]))

            return lax.fori_loop(0, K, wr, P), 0

        P, _ = lax.scan(step, P, batches)
        return tuple(P[c, :planes[c].shape[0], :planes[c].shape[1]]
                     for c in range(3))

    return run


def _subsampling(cfmt: int) -> tuple:
    sub_w = 2 if cfmt in (1, 2) else 1
    sub_h = 2 if cfmt == 1 else 1
    return sub_w, sub_h


def compute_unit_levels(desc: np.ndarray, cfmt: int) -> np.ndarray:
    """Exact dependency level per descriptor row (host, numpy).

    Maintains one level map per component plane (granularity 4 px luma,
    2 px chroma — every intra unit and its reference rows/columns are
    aligned to those grids).  A unit's level is 1 + the max level over
    the cells its top/left fill runs read (plus, for CCLM, the
    co-located luma region); its own block cells are then stamped with
    that level.  Cells never written (picture border, MC output,
    unavailable-substituted) stay at level 0."""
    n = desc.shape[0]
    lvl = np.zeros(n, dtype=np.int32)
    if n == 0:
        return lvl
    sub_w, sub_h = _subsampling(cfmt)
    gsh = {0: 2, 1: 1, 2: 1}
    maps = {}
    for comp in (0, 1, 2):
        sel = desc[:, 0] == comp
        if not sel.any():
            continue
        dd = desc[sel]
        hh = int(max(dd[:, 2].max() + dd[:, 4].max() * 2,
                     dd[:, 22].max() + 1)) + 4
        ww = int(max(dd[:, 1].max() + dd[:, 3].max() * 2,
                     dd[:, 16].max() + 1)) + 4
        maps[comp] = np.zeros(((hh >> gsh[comp]) + 2,
                               (ww >> gsh[comp]) + 2), dtype=np.int32)
    for i in range(n):
        d = desc[i]
        comp = int(d[0])
        g = gsh[comp]
        m = maps[comp]
        dep = 0
        if d[10] != 1:  # has references
            c0, c1 = int(d[15]) >> g, int(d[16]) >> g
            for rr in {int(d[11]), int(d[12])}:
                if rr >= 0:
                    seg = m[rr >> g, c0:c1 + 1]
                    if seg.size:
                        dep = max(dep, int(seg.max()))
            r0, r1 = int(d[21]) >> g, int(d[22]) >> g
            for cc in {int(d[17]), int(d[18])}:
                if cc >= 0:
                    seg = m[max(r0, 0):r1 + 1, cc >> g]
                    if seg.size:
                        dep = max(dep, int(seg.max()))
        if d[29] & 1:  # LMCS chroma scale reads luma left/above the VPDU
            lm_ = maps[0]
            xp, yp = int(d[30]), int(d[31])
            r0 = max(0, yp - 1) >> 2
            r1 = min((yp + 64) >> 2, lm_.shape[0] - 1)
            c0 = max(0, xp - 1) >> 2
            c1 = min((xp + 64) >> 2, lm_.shape[1] - 1)
            seg = lm_[r0:r1 + 1, c0:c1 + 1]
            if seg.size:
                dep = max(dep, int(seg.max()))
        if d[7] == 4:  # CCLM reads the co-located reconstructed luma
            lm = maps[0]
            x, y, w, h = int(d[1]), int(d[2]), int(d[3]), int(d[4])
            ext_r = y + max(h, int(d[25])) + 1
            ext_c = x + max(w, int(d[24])) + 1
            r0 = max(0, (y - 1) * sub_h) >> 2
            r1 = min((ext_r * sub_h) >> 2, lm.shape[0] - 1)
            c0 = max(0, (x - 1) * sub_w) >> 2
            c1 = min((ext_c * sub_w) >> 2, lm.shape[1] - 1)
            seg = lm[r0:r1 + 1, c0:c1 + 1]
            if seg.size:
                dep = max(dep, int(seg.max()))
        li = dep + 1
        lvl[i] = li
        x, y, w, h = int(d[1]), int(d[2]), int(d[3]), int(d[4])
        m[y >> g:(y + h) >> g, x >> g:(x + w) >> g] = li
    return lvl


def build_wavefront_batches(desc: np.ndarray, lvl: np.ndarray,
                            K: int) -> np.ndarray:
    """[S, K, D] scan input: units grouped by (level, mode_class) — each
    step homogeneous in kernel family (components mix freely; the scan
    carries a stacked [3, H, W] plane) — chunked to K units per step,
    padding rows marked invalid (d[28] = 0)."""
    order = np.argsort(lvl, kind="stable")
    groups: dict = {}
    for i in order:
        kkey = (int(lvl[i]), int(desc[i, 7]))
        groups.setdefault(kkey, []).append(i)
    steps = []
    for kkey in groups:
        idxs = groups[kkey]
        for j in range(0, len(idxs), K):
            chunk = idxs[j:j + K]
            b = np.zeros((K, D), dtype=np.int32)
            b[:len(chunk)] = desc[chunk]
            steps.append(b)
    return np.stack(steps) if steps \
        else np.zeros((0, K, D), dtype=np.int32)


def scan_key(cs) -> tuple:
    """Static configuration of the intra scan program for this stream."""
    return (cs.sps.bit_depth, cs.sps.chroma_format_idc,
            bool(cs.sps.chroma_ver_collocated), cs.sps.ctu_log2)


def run_intra_scan(planes_pad, resi_pad, desc: np.ndarray, key,
                   lmcs: np.ndarray | None = None):
    """Run the intra chain on device.  planes_pad/resi_pad: 3 padded
    int32 device arrays (mono: dummy chroma >= (B+1, B+1)); desc is the
    [n, D] host descriptor tensor (bucketed to powers of two here);
    key = scan_key(cs) (or a bare bit depth for intra-only content);
    lmcs = build_lmcs_params(...) when the picture uses LMCS.

    Default path: the wavefront-batched scan (independent units per
    step).  VVDEC_INTRA_SCAN=seq selects the one-unit-per-step scan
    (the debugging / parity baseline)."""
    import os

    n = desc.shape[0]
    if n == 0:
        return tuple(planes_pad)
    full_key = key if isinstance(key, tuple) else (key, 1, True, 7)
    has_lmcs = lmcs is not None
    lm = jnp.asarray(lmcs if has_lmcs
                     else np.zeros(LM_LEN, dtype=np.int32))
    if os.environ.get("VVDEC_INTRA_SCAN", "wavefront") != "seq":
        K = int(os.environ.get("VVDEC_INTRA_SCAN_K", "8"))
        lvl = compute_unit_levels(desc, full_key[1])
        batches = build_wavefront_batches(desc, lvl, K)
        s = batches.shape[0]
        s_pad = 1 << max(0, (s - 1)).bit_length()
        if s_pad != s:  # all-invalid steps scatter nothing (d[28]=0)
            pad = np.zeros((s_pad - s, K, D), dtype=np.int32)
            batches = np.concatenate([batches, pad])
        fn = _intra_wavefront_fn(*full_key, K, has_lmcs)
        return fn(tuple(planes_pad), tuple(resi_pad),
                  jnp.asarray(batches), lm)
    n_pad = 1 << max(0, (n - 1)).bit_length()
    if n_pad != n:
        pad = np.zeros((n_pad - n, D), dtype=np.int32)
        desc = np.concatenate([desc, pad])
    fn = _intra_scan_fn(*full_key, has_lmcs)
    return fn(tuple(planes_pad), tuple(resi_pad), jnp.asarray(desc), lm)


# ======================================================================
# host descriptor builder
# ======================================================================
def _fill_params(cs, order_map, wpp, ctu_log2, tu, cu, comp):
    """Reference-fill geometry for one unit -> 13 ints, avail0 flag; or
    None for the degenerate corner-only layout the golden zero-fills
    (frame falls back whole to the host plane).  Mirrors
    recon_np.fill_reference (mrl = 0) exactly, index-space only."""
    from vvdec_tpu.frame.recon_np import sample_available

    x, y, w, h = tu.blocks[comp]
    wp_, hp_ = cs.comp_size[comp]
    sx = cs.sub_w if comp else 1
    sy = cs.sub_h if comp else 1
    unit_w = 4 // sx
    unit_h = 4 // sy
    order = tu.order

    def av(px, py):
        return sample_available(cs, order_map, wpp, ctu_log2, px, py,
                                comp, cu, order)

    total_above = (2 * w + unit_w - 1) // unit_w
    total_left = (2 * h + unit_h - 1) // unit_h
    n_topleft = 1 if av(x - 1, y - 1) else 0
    n_above = 0
    for u in range(total_above):
        if av(x + u * unit_w, y - 1):
            n_above += 1
        else:
            break
    n_left = 0
    for u in range(total_left):
        if av(x - 1, y + u * unit_h):
            n_left += 1
        else:
            break
    if n_topleft + n_above + n_left == 0:
        return (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), 1
    if n_topleft + n_above + n_left == total_above + total_left + 1:
        txhi = min(x - 1 + 2 * w, wp_ - 1)
        lyhi = min(y + 2 * h - 1, hp_ - 1)
        return (y - 1, y - 1, 0, x - 1, x - 1, txhi,
                x - 1, x - 1, 0, y - 1, y - 1, lyhi), 0
    if n_left > 0:
        n_l = min(n_left * unit_h, 2 * h, hp_ - y)
        lylo = y - 1 if n_topleft else y
        lyhi = y + n_l - 1
        if n_above > 0:
            n_a = min(n_above * unit_w, 2 * w, wp_ - x)
            txhi = x + n_a - 1
        else:
            txhi = x - 1
        if n_topleft:
            ty_a = ty_b = y - 1
            ty_k = 0
        elif n_above > 0:
            ty_a, ty_b, ty_k = y, y - 1, 1
        else:
            ty_a = ty_b = y
            ty_k = 0
        return (ty_a, ty_b, ty_k, x - 1, x - 1, txhi,
                x - 1, x - 1, 0, y - 1, lylo, lyhi), 0
    # left column unavailable: top row drives everything
    if n_above == 0:
        # corner-only layout (golden zero-fills top[1:]); host fallback
        return None
    n_a = min(n_above * unit_w, 2 * w, wp_ - x)
    return (y - 1, y - 1, 0, x - 1, x, x + n_a - 1,
            x, x, 0, 0, y - 1, y - 1), 0


def build_intra_descriptors(cs):
    """(desc [n, D] int32, None) for a device-eligible picture, or
    (None, reason) naming the first tool outside the device intra set.
    Walks cs.tus in parse order, maintaining the TU order map the
    availability rule needs (recon_np parity)."""
    from vvdec_tpu.frame.recon_np import (
        CHROMA422_MAP,
        DIA_IDX,
        HOR_IDX,
        VER_IDX,
        co_located_luma_mode_of,
        sample_available,
        wide_angle,
    )
    from vvdec_tpu.frame.structure import (
        DC_IDX,
        DM_CHROMA_IDX,
        LM_CHROMA_IDX,
        MDLM_L_IDX,
        MDLM_T_IDX,
        MODE_INTRA,
        MTS_SKIP,
        NUM_LUMA_MODE,
        PLANAR_IDX,
    )

    if cs.sps.bit_depth > 10:
        return None, "bit_depth>10"
    lmcs_on = bool(cs.ph.lmcs_enabled
                   and getattr(cs, "lmcs_info", None) is not None)
    if lmcs_on and len({bool(s.lmcs_enabled) for s in cs.shs}) > 1:
        # mixed per-slice reshaping would need a masked inverse map
        return None, "lmcs_mixed_slices"
    if lmcs_on and not cs.shs[0].lmcs_enabled:
        lmcs_on = False  # model present but disabled for every slice
    chroma_scale_on = lmcs_on and cs.ph.chroma_residual_scale \
        and cs.num_comp > 1
    if cs.sps.ibc_enabled:
        return None, "ibc"
    if cs.sps.act_enabled:
        return None, "act"
    wpp = cs.sps.entropy_coding_sync_enabled
    ctu_log2 = cs.sps.ctu_log2
    order_map = np.full((cs.h >> 2, cs.w >> 2), -1, dtype=np.int32)
    if type(cs.tus) is list:
        for i, tu in enumerate(cs.tus):
            tu.order = i

    def final_mode(cu, comp):
        if comp == 0:
            return cu.intra_dir[0]
        mode = cu.intra_dir[1]
        if mode == DM_CHROMA_IDX:
            mode = co_located_luma_mode_of(cs, cu)
        if cs.sps.chroma_format_idc == 2 and mode < 67:
            mode = CHROMA422_MAP[mode]
        return mode

    rows = []
    seen_ciip: set = set()
    vpdu_cache: dict = {}

    def lmcs_fields(tu_, comp_):
        """(flags, x_pos, y_pos, 0) for the device chroma residual
        scale (calculateChromaAdjVpduNei geometry; value-independent —
        the average itself runs on device)."""
        if not chroma_scale_on or comp_ not in (1, 2):
            return (0, 0, 0, 0)
        if tu_.blocks[1] is None:
            return (0, 0, 0, 0)
        _, _, cw_, ch_ = tu_.blocks[1]
        if cw_ * ch_ <= 4 or not (tu_.cbf[1] or tu_.cbf[2]
                                  or tu_.joint_cbcr):
            return (0, 0, 0, 0)
        if not (tu_.cbf[comp_] or tu_.joint_cbcr):
            return (0, 0, 0, 0)
        if tu_.blocks[0] is not None:
            lx, ly = tu_.blocks[0][0], tu_.blocks[0][1]
        else:
            lx = tu_.blocks[1][0] * cs.sub_w
            ly = tu_.blocks[1][1] * cs.sub_h
        ctu_sz = cs.sps.ctu_size
        vmask = 63 if ctu_sz == 128 else (ctu_sz - 1)
        vx, vy = lx & ~vmask, ly & ~vmask
        if (vx, vy) not in vpdu_cache:
            top_left = cs.cu_at(vx, vy, 0)
            x_pos, y_pos = top_left.x, top_left.y
            above = cs.cu_at_restricted(x_pos, y_pos - 1, top_left, 0)
            left_n = cs.cu_at_restricted(x_pos - 1, y_pos, top_left, 0)
            vpdu_cache[(vx, vy)] = (
                x_pos, y_pos, (2 if left_n is not None else 0)
                | (4 if above is not None else 0))
        x_pos, y_pos, nbf = vpdu_cache[(vx, vy)]
        return (1 | nbf, x_pos, y_pos, 0)
    for tu in cs.tus:
        cu = cs.cus[tu.cu_idx]
        is_intra = cu.pred_mode == MODE_INTRA
        if not is_intra:
            # inter CUs reconstruct in the device MC stage; gate the
            # tools outside its family (ops/mc_device._cu_mc_eligible
            # re-checks the motion-dependent gates post-derivation)
            if cu.pred_mode != 0:  # not MODE_INTER -> MODE_IBC
                return None, "ibc"
            if cu.ciip_flag and cu.idx not in seen_ciip:
                # CIIP: the planar-intra blend runs as a scan unit at
                # this CU's parse position, over the RAW inter pred the
                # MC stage stores (predBlendIntraCiip,
                # IntraPrediction.cpp:884); weights from the neighbor
                # prediction modes (value-independent)
                seen_ciip.add(cu.idx)
                if cu.w > 64 or cu.h > 64:
                    return None, "ciip_size"
                lnb = cs.cu_at_restricted(cu.x - 1, cu.y + cu.h - 1,
                                          cu, 0)
                anb = cs.cu_at_restricted(cu.x + cu.w - 1, cu.y - 1,
                                          cu, 0)
                n0 = bool(lnb and lnb.pred_mode == MODE_INTRA
                          and lnb.idx < cu.idx)
                n1 = bool(anb and anb.pred_mode == MODE_INTRA
                          and anb.idx < cu.idx)
                w_intra = 3 - (not n0) - (not n1)
                w_merge = 3 - n0 - n1
                ncomp = cs.num_comp \
                    if (cs.num_comp > 1 and cu.cw > 2) else 1
                import types
                for comp in range(ncomp):
                    blocks = [None, None, None]
                    if comp == 0:
                        blocks[0] = (cu.x, cu.y, cu.w, cu.h)
                        w_, h_ = cu.w, cu.h
                    else:
                        blocks[comp] = (cu.cx, cu.cy, cu.cw, cu.ch)
                        if blocks[1] is None:
                            blocks[1] = blocks[comp]
                        w_, h_ = cu.cw, cu.ch
                    tmp = types.SimpleNamespace(blocks=blocks,
                                                order=tu.order)
                    fp = _fill_params(cs, order_map, wpp, ctu_log2,
                                      tmp, cu, comp)
                    if fp is None:
                        return None, "fill_corner_case"
                    fill, avail0 = fp
                    x_, y_ = blocks[comp][0], blocks[comp][1]
                    rows.append((
                        comp, x_, y_, w_, h_, w_.bit_length() - 1,
                        h_.bit_length() - 1, 5,
                        1 if (comp == 0 and w_ * h_ > 32) else 0, 1,
                        avail0, *fill, 0, w_intra, w_merge, 0,
                        1 if (w_ >= 4 and h_ >= 4) else 0, 1,
                        0, 0, 0, 0))
        if is_intra:
            if cu.isp_mode:
                return None, "isp"
            if cu.multi_ref_idx:
                return None, "mrl"
            if cu.bdpcm_mode or cu.bdpcm_mode_chroma:
                return None, "bdpcm"
            if cu.color_transform:
                return None, "act"
        comps = []
        if tu.blocks[0] is not None and cu.has_luma:
            comps.append(0)
        if tu.blocks[1] is not None and cu.has_chroma and cs.num_comp > 1:
            comps += [1, 2]
        for comp in comps:
            x, y, w, h = tu.blocks[comp]
            # joint Cb-Cr: BOTH chroma planes carry residual (the device
            # ITX stage derives the uncoded one, frame_device._jccr_fn)
            cbf = bool(tu.cbf[comp]
                       or (comp in (1, 2) and tu.joint_cbcr))
            # transform-skip residuals run in the device TS-dequant
            # stage (itx_residual_device); BDPCM is rejected above
            if not is_intra:
                continue
            if w > 64 or h > 64 or w < 1 or h < 1:
                return None, "block_size"
            fp = _fill_params(cs, order_map, wpp, ctu_log2, tu, cu, comp)
            if fp is None:
                return None, "fill_corner_case"
            fill, avail0 = fp
            l2w, l2h = w.bit_length() - 1, h.bit_length() - 1
            if comp == 0 and cu.mip_flag:
                from vvdec_tpu.frame.recon_np import mip_size_id
                rows.append((
                    comp, x, y, w, h, l2w, l2h, 3, 0,
                    1 if cbf else 0, avail0, *fill, 0, cu.intra_dir[0],
                    1 if cu.mip_transpose else 0, mip_size_id(w, h), 0, 1,
                    0, 0, 0, 0))
                continue
            mode = final_mode(cu, comp)
            if mode >= NUM_LUMA_MODE:
                # CCLM chroma modes: template availability geometry on
                # the host, the sampling + fit + transform on device
                if not (LM_CHROMA_IDX <= mode <= MDLM_T_IDX):
                    return None, "chroma_mode"

                def av(px, py):
                    return sample_available(cs, order_map, wpp, ctu_log2,
                                            px, py, comp, cu, tu.order)

                unit = 2
                tu_w_units = w // unit
                tu_h_units = h // unit
                cu_above = av(cu.cx, cu.cy - 1)
                cu_left = av(cu.cx - 1, cu.cy)
                above_flag = cu_above or y > cu.cy
                left_flag = cu_left or x > cu.cx
                above_avail = left_avail = False
                actual_top = actual_left = 0
                if mode == MDLM_T_IDX:
                    avai_above = 0
                    if above_flag:
                        avai_above = tu_w_units
                        ar_units = min((2 * w) // unit - tu_w_units,
                                       h // unit)
                        for u in range(ar_units):
                            if av(x + w + u * unit, y - 1):
                                avai_above += 1
                            else:
                                break
                    above_avail = avai_above >= tu_w_units
                    actual_top = unit * avai_above
                elif mode == MDLM_L_IDX:
                    avai_left = 0
                    if left_flag:
                        avai_left = tu_h_units
                        lb_units = min((2 * h) // unit - tu_h_units,
                                       w // unit)
                        for u in range(lb_units):
                            if av(x - 1, y + h + u * unit):
                                avai_left += 1
                            else:
                                break
                    left_avail = avai_left >= tu_h_units
                    actual_left = unit * avai_left
                else:
                    above_avail = bool(above_flag)
                    left_avail = bool(left_flag)
                    actual_top = w if above_avail else 0
                    actual_left = h if left_avail else 0
                rows.append((
                    comp, x, y, w, h, w.bit_length() - 1,
                    h.bit_length() - 1, 4, 0, 1 if cbf else 0, avail0,
                    *fill, 1 if left_flag else 0, actual_top, actual_left,
                    (1 if above_avail else 0) | (2 if left_avail else 0),
                    1 if above_flag else 0, 1, *lmcs_fields(tu, comp)))
                continue
            do_pdpc = 1 if (w >= 4 and h >= 4) else 0
            # mode classification + angular parameters
            filtered = 0
            if mode == PLANAR_IDX:
                mode_class, is_ver, angle, inv, kind = 0, 0, 0, 0, 0
                if comp == 0 and w * h > 32:
                    filtered = 1
            elif mode == DC_IDX:
                mode_class, is_ver, angle, inv, kind = 1, 0, 0, 0, 0
            else:
                mode_class = 2
                pred_mode = wide_angle(w, h, mode)
                is_ver = 1 if pred_mode >= DIA_IDX else 0
                ang_mode = (pred_mode - VER_IDX) if is_ver \
                    else -(pred_mode - HOR_IDX)
                abs_ang = int(ANG_TABLE[abs(ang_mode)])
                inv = int(INV_ANG_TABLE[abs(ang_mode)])
                angle = abs_ang if ang_mode >= 0 else -abs_ang
                diff = min(abs(pred_mode - HOR_IDX),
                           abs(pred_mode - VER_IDX))
                log2_size = (l2w + l2h) >> 1
                thresh_ok = diff > INTRA_FILTER_THRESH[0][log2_size]
                if (abs_ang & 0x1F) == 0:
                    kind = 0
                    if comp == 0 and thresh_ok:
                        filtered = 1
                elif comp != 0:
                    kind = 3
                else:
                    kind = 2 if thresh_ok else 1
            rows.append((
                comp, x, y, w, h, l2w, l2h, mode_class, filtered,
                1 if cbf else 0, avail0, *fill, is_ver, angle, inv,
                kind, do_pdpc, 1, *lmcs_fields(tu, comp)))
        # mark the TU decoded (luma-granularity availability map)
        if tu.blocks[0] is not None:
            mx, my, mw, mh = tu.blocks[0]
        else:
            cxx, cyy, cww, chh = tu.blocks[1]
            mx, my = cxx * cs.sub_w, cyy * cs.sub_h
            mw, mh = cww * cs.sub_w, chh * cs.sub_h
        order_map[my >> 2: (my + mh) >> 2, mx >> 2: (mx + mw) >> 2] \
            = tu.order
    if not rows:
        # all-inter picture: valid, the intra scan is a no-op
        return np.zeros((0, D), dtype=np.int32), None
    return np.asarray(rows, dtype=np.int32), None
