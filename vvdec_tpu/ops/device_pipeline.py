"""Device-resident post-reconstruction filter pipeline.

One jitted XLA program per frame runs the whole in-loop filter chain on
device — deblock (V then H, luma + chroma), SAO, ALF/CC-ALF (including
the pixel-dependent 4x4 classification) — and bit-packs the 10-bit output
for the narrow device->host link.  Parameters are uploaded as *compact
per-CTU tensors* and expanded to per-pixel maps on device, so the host
per frame only uploads the reconstructed planes (fast direction), a few
KB of parameters, and reads back one packed buffer per frame,
asynchronously (`copy_to_host_async`) so a deep frame pipeline hides the
full device round-trip behind host parse+recon of later frames.

This replaces the reference's per-CTU wavefront filter tasks
(DecLibRecon.cpp:603-641, LoopFilter/SampleAdaptiveOffset/
AdaptiveLoopFilter) with whole-frame batched stages — the TPU-native
design from SURVEY.md §7.

Scope gates (host fallback otherwise, bit-exactness preserved): no
virtual boundaries, no subpictures, loop-filter-across enabled for
slices/tiles, bit depth <= 10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvdec_tpu.ops.deblock_dense import (
    deblock_chroma_dense_core,
    deblock_luma_dense_core,
    pack_chroma_grid,
    pack_luma_grid,
)
from vvdec_tpu.ops.pipeline import _alf_diamond_dense_core

_ACT_TH = np.array((0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4),
                   dtype=np.int32)
_TRANSPOSE = np.array((0, 1, 0, 2, 2, 3, 1, 3), dtype=np.int32)


def device_filter_reject_reason(cs) -> str | None:
    """Why this picture's filter config falls back to the host chain
    (None = device-eligible).  Counted per frame in
    StreamDecoder.fallback_census so silent fallbacks are visible
    (Decoder.get_decoder_info reports the census)."""
    if cs.sps.bit_depth > 10:
        return "bit_depth>10"
    vbx, vby = cs.virtual_boundaries()
    if vbx or vby:
        return "virtual_boundaries"
    if cs.subpics:
        return "subpics"
    if len(cs.shs) > 1 and not cs.pps.loop_filter_across_slices:
        return "lf_across_slices_off"
    if len(cs.shs) > 16:
        # per-slice offsets become a select chain in the dense deblock
        return ">16_slices"
    if not cs.pps.no_pic_partition \
            and not cs.pps.loop_filter_across_tiles:
        return "lf_across_tiles_off"
    return None


def device_filter_eligible(cs) -> bool:
    """Whether the device chain models this picture's filter config."""
    return device_filter_reject_reason(cs) is None


# ======================================================================
# on-device ALF classification (deriveClassificationBlk, whole frame)
# ======================================================================
def _classify_dense(src, h: int, w: int, bd: int, vb_h: int, vb_pos: int):
    """Whole-frame 4x4 ALF classification, gather- and stride-free.

    The half-grid laplacians are evaluated at FULL resolution with
    unit-stride pad+slice accesses (lane-strided slices relayout badly on
    TPU); the per-4x4-block 16-point aggregation becomes a separable
    shifted-add followed by a phase-masked reshape block-sum.  VB row
    exceptions are compile-time row masks.  Bit-exact parity with
    _classify_jnp."""
    s = src.astype(jnp.int32)
    # full-res laplacians: F[d][y, x] = lap as if (y, x) were a half-grid
    # sample point.  Row access r(dy) = clip(y + dy, 0, h-1) with the VB
    # exceptions dy=2 -> 1 (vb_lo rows) and dy=-1 -> 0 (vb_hi rows).
    pad = jnp.pad(s, ((3, 5), (3, 5)), mode="edge")
    ys = np.arange(-2, h + 2)  # sample rows evaluated (phase handles sel)
    # evaluate at every y in [0, h+4) shifted by -2: F arrays indexed by
    # u = y + 2 (u in [0, h+4))
    H = h + 4
    W = w + 4
    vb_lo = (ys > 0) & (ys % vb_h == vb_pos - 2)
    vb_hi = (ys > 0) & (~vb_lo) & (ys % vb_h == vb_pos)
    vb_lo_r = jnp.asarray(vb_lo[:, None])
    vb_hi_r = jnp.asarray(vb_hi[:, None])

    def R(d, e):
        # value s[clip(y+d, 0, h-1), clip(x+e, 0, w-1)] for y=u-2, x=v-2
        base = pad[1 + d: 1 + d + H, 1 + e: 1 + e + W]
        if d == 2:
            base = jnp.where(vb_lo_r, pad[2: 2 + H, 1 + e: 1 + e + W],
                             base)
        if d == -1:
            base = jnp.where(vb_hi_r, pad[1: 1 + H, 1 + e: 1 + e + W],
                             base)
        return base

    y0v = R(0, 0) * 2
    yup1 = R(1, 1) * 2
    lap_v = jnp.abs(y0v - R(-1, 0) - R(1, 0)) \
        + jnp.abs(yup1 - R(0, 1) - R(2, 1))
    lap_h = jnp.abs(y0v - R(0, 1) - R(0, -1)) \
        + jnp.abs(yup1 - R(1, 2) - R(1, 0))
    lap_d0 = jnp.abs(y0v - R(-1, -1) - R(1, 1)) \
        + jnp.abs(yup1 - R(0, 0) - R(2, 2))
    lap_d1 = jnp.abs(y0v - R(1, -1) - R(-1, 1)) \
        + jnp.abs(yup1 - R(2, 0) - R(0, 2))
    lap = jnp.stack([lap_v, lap_h, lap_d0, lap_d1])  # [4, H, W] full-res

    # 4x4-block 16-point sums: sum over offsets {-2,0,2,4}^2 around each
    # block origin.  Separable shifted adds, then select the block-origin
    # phase with a constant mask and reshape-sum.
    h4, w4 = h // 4, w // 4
    lapp = jnp.pad(lap, ((0, 0), (0, 0), (0, 6)))
    colsum = None
    for b in range(4):
        t = lapp[:, :, 2 * b: 2 * b + W]
        colsum = t if colsum is None else colsum + t
    colsum = jnp.pad(colsum, ((0, 0), (0, 6), (0, 0)))
    rows = [colsum[:, 2 * a: 2 * a + H, :] for a in range(4)]
    sum4_full = rows[0] + rows[1] + rows[2] + rows[3]
    # VB 3-row variants: rows at block y≡vb_pos-4 drop the last row
    # (a=3); rows at y≡vb_pos drop the first (a=0)
    yy = np.arange(H)
    xx = np.arange(W)
    # phase mask: block (i4, j4) origin sits at u = 4*i4, v = 4*j4
    # (u = 2*gi with gi = 2*i4; sample row y = u - 2)
    ph_y = (yy % 4 == 0) & (yy < 4 * h4)
    ph_x = (xx % 4 == 0) & (xx < 4 * w4)
    # VB 3-row variants keyed by the block's pixel row 4*i4 = u:
    # (4*i4) % vb_h == vb_pos-4 drops the last half-row; == vb_pos drops
    # the first
    ymod_full = yy % vb_h
    row_lo_f = jnp.asarray((ymod_full == vb_pos - 4)[None, :, None])
    row_hi_f = jnp.asarray((ymod_full == vb_pos)[None, :, None])
    sums_full = jnp.where(row_lo_f, sum4_full - rows[3],
                          jnp.where(row_hi_f, sum4_full - rows[0],
                                    sum4_full))
    phase = jnp.asarray((ph_y[:, None] & ph_x[None, :]).astype(np.int32))
    masked = sums_full * phase[None, :, :]
    # block-sum [4, H, W] -> [4, h4, w4] via reshape (no strided slices)
    crop = masked[:, : 4 * h4, : 4 * w4]
    sums = crop.reshape(4, h4, 4, w4, 4).sum(axis=(2, 4))
    sum_v, sum_h, sum_d0, sum_d1 = (sums[k] for k in range(4))
    ymod = (4 * np.arange(h4)) % vb_h
    row_lo = (ymod == vb_pos - 4)[None, :, None]
    row_hi = (ymod == vb_pos)[None, :, None]

    shift = bd + 4
    temp_act = sum_v + sum_h
    near = jnp.asarray(row_lo[0] | row_hi[0])
    act = jnp.where(near, (temp_act * 96) >> shift,
                    (temp_act * 64) >> shift)
    act = jnp.clip(act, 0, 15)
    # _ACT_TH as a monotone threshold count (values 0,1,2,2..2,3..3,4)
    cls = ((act >= 1).astype(jnp.int32) + (act >= 2) + (act >= 7)
           + (act >= 15))

    vgh = sum_v > sum_h
    hv1 = jnp.where(vgh, sum_v, sum_h)
    hv0 = jnp.where(vgh, sum_h, sum_v)
    dir_hv = jnp.where(vgh, 1, 3)
    dgd = sum_d0 > sum_d1
    d1 = jnp.where(dgd, sum_d0, sum_d1)
    d0 = jnp.where(dgd, sum_d1, sum_d0)
    dir_d = jnp.where(dgd, 0, 2)
    dsel = (d1.astype(jnp.uint32) * hv0.astype(jnp.uint32)) \
        > (hv1.astype(jnp.uint32) * d0.astype(jnp.uint32))
    hvd1 = jnp.where(dsel, d1, hv1)
    hvd0 = jnp.where(dsel, d0, hv0)
    main_dir = jnp.where(dsel, dir_d, dir_hv)
    sec_dir = jnp.where(dsel, dir_hv, dir_d)
    strength = jnp.where(hvd1.astype(jnp.uint32) * 2
                         > 9 * hvd0.astype(jnp.uint32), 2,
                         jnp.where(hvd1 > 2 * hvd0, 1, 0))
    cls = jnp.where(strength > 0,
                    cls + (((main_dir & 1) << 1) + strength) * 5, cls)
    # _TRANSPOSE[main_dir*2 + (sec_dir>>1)] = (0,1,0,2,2,3,1,3) as selects
    idx = main_dir * 2 + (sec_dir >> 1)
    tr = jnp.where(idx == 1, 1,
                   jnp.where(idx == 3, 2,
                             jnp.where(idx == 4, 2,
                                       jnp.where(idx == 5, 3,
                                                 jnp.where(idx == 6, 1,
                                                           jnp.where(
                                                               idx == 7, 3,
                                                               0))))))
    return cls, tr


def _classify_jnp(src, h: int, w: int, bd: int, vb_h: int, vb_pos: int):
    """Whole-frame 4x4 ALF classification; parity with
    frame/alf_np.classify (bounds=None).  Returns (cls, tr) [h/4, w/4]."""
    s = src.astype(jnp.int32)
    gh = (h + 4) // 2
    gw = (w + 4) // 2

    i = np.arange(0, h + 4, 2)
    yoff = i - 2
    r0 = yoff - 1
    r1 = yoff
    r2 = yoff + 1
    r3 = yoff + 2
    ybase = i - 2
    vb_lo = (ybase > 0) & (ybase % vb_h == vb_pos - 2)
    vb_hi = (ybase > 0) & (~vb_lo) & (ybase % vb_h == vb_pos)
    r3 = np.where(vb_lo, r2, r3)
    r0 = np.where(vb_hi, r1, r0)
    r0, r1, r2, r3 = (np.clip(r, 0, h - 1) for r in (r0, r1, r2, r3))
    js = np.arange(0, w + 4, 2)
    pix = js - 2
    cm1, c0, cp1, cp2 = (np.clip(pix + d, 0, w - 1) for d in (-1, 0, 1, 2))

    s0 = s[r0]
    s1 = s[r1]
    s2 = s[r2]
    s3 = s[r3]
    y0v = s1[:, c0] * 2
    yup1 = s2[:, cp1] * 2
    lap_v = jnp.abs(y0v - s0[:, c0] - s2[:, c0]) \
        + jnp.abs(yup1 - s1[:, cp1] - s3[:, cp1])
    lap_h = jnp.abs(y0v - s1[:, cp1] - s1[:, cm1]) \
        + jnp.abs(yup1 - s2[:, cp2] - s2[:, c0])
    lap_d0 = jnp.abs(y0v - s0[:, cm1] - s2[:, cp1]) \
        + jnp.abs(yup1 - s1[:, c0] - s3[:, cp2])
    lap_d1 = jnp.abs(y0v - s2[:, cm1] - s0[:, cp1]) \
        + jnp.abs(yup1 - s3[:, c0] - s1[:, cp2])
    lap = jnp.stack([lap_v, lap_h, lap_d0, lap_d1])  # [4, gh, gw]

    # 4-cell horizontal aggregation at each column
    lp = jnp.pad(lap, ((0, 0), (0, 3), (0, 3)))
    agg = lp[:, :gh, :gw] + lp[:, :gh, 1:gw + 1] + lp[:, :gh, 2:gw + 2] \
        + lp[:, :gh, 3:gw + 3]
    # 4-row (VB: 3-row) vertical aggregation per 4x4 block
    h4, w4 = h // 4, w // 4
    rs = 2 * np.arange(h4)
    cssel = 2 * np.arange(w4)
    aggp = jnp.pad(agg, ((0, 0), (0, 3), (0, 0)))
    S = [aggp[:, rs + k][:, :, cssel] for k in range(4)]  # [4][4, h4, w4]
    sum4 = S[0] + S[1] + S[2] + S[3]
    ymod = (4 * np.arange(h4)) % vb_h
    row_lo = (ymod == vb_pos - 4)[None, :, None]
    row_hi = (ymod == vb_pos)[None, :, None]
    sums = jnp.where(row_lo, sum4 - S[3],
                     jnp.where(row_hi, sum4 - S[0], sum4))
    sum_v, sum_h, sum_d0, sum_d1 = (sums[k] for k in range(4))

    shift = bd + 4
    temp_act = sum_v + sum_h
    near = row_lo[0] | row_hi[0]
    act = jnp.where(near, (temp_act * 96) >> shift,
                    (temp_act * 64) >> shift)
    act = jnp.clip(act, 0, 15)
    cls = jnp.asarray(_ACT_TH)[act]

    vgh = sum_v > sum_h
    hv1 = jnp.where(vgh, sum_v, sum_h)
    hv0 = jnp.where(vgh, sum_h, sum_v)
    dir_hv = jnp.where(vgh, 1, 3)
    dgd = sum_d0 > sum_d1
    d1 = jnp.where(dgd, sum_d0, sum_d1)
    d0 = jnp.where(dgd, sum_d1, sum_d0)
    dir_d = jnp.where(dgd, 0, 2)
    dsel = (d1.astype(jnp.uint32) * hv0.astype(jnp.uint32)) \
        > (hv1.astype(jnp.uint32) * d0.astype(jnp.uint32))
    hvd1 = jnp.where(dsel, d1, hv1)
    hvd0 = jnp.where(dsel, d0, hv0)
    main_dir = jnp.where(dsel, dir_d, dir_hv)
    sec_dir = jnp.where(dsel, dir_hv, dir_d)
    strength = jnp.where(hvd1.astype(jnp.uint32) * 2
                         > 9 * hvd0.astype(jnp.uint32), 2,
                         jnp.where(hvd1 > 2 * hvd0, 1, 0))
    cls = jnp.where(strength > 0,
                    cls + (((main_dir & 1) << 1) + strength) * 5, cls)
    tr = jnp.asarray(_TRANSPOSE)[main_dir * 2 + (sec_dir >> 1)]
    return cls, tr


# ======================================================================
# on-device SAO with per-CTU parameter expansion (gather-free)
# ======================================================================
def _expand_ctu(vals, rep_y: int, rep_x: int, out_h: int, out_w: int,
                w_ctu: int):
    """Broadcast per-CTU values [n_ctu] (row-major) onto a dense grid by
    reshape+repeat — no gathers (a per-pixel CTU-index gather costs
    milliseconds per launch on TPU)."""
    g = vals.reshape(-1, w_ctu)
    return jnp.repeat(jnp.repeat(g, rep_y, 0), rep_x, 1)[:out_h, :out_w]


def _sao_plane(plane, sao_type, vals, *, h, w, ctu_w, ctu_h, w_ctu, bd,
               row0=None, img_h=None):
    """SAO for one plane.  sao_type: [n_ctu] (255 = off); vals:
    [n_ctu, 6] compact offsets — EO: (_, o0..o4); BO: (band, b0..b3, _).
    Availability = in-picture (gated).  All parameter maps are CTU-grid
    broadcasts; the only data-dependent selects are on the per-pixel
    edge class / band index.

    Row-sharded use: `row0` (traced) is the absolute image row of array
    row 0 and `img_h` the full picture height, so the top/bottom border
    trimming applies at the true picture edges rather than the shard
    edges."""
    pel_max = (1 << bd) - 1
    band_shift = bd - 5
    c = plane.astype(jnp.int32)
    typ = _expand_ctu(sao_type, ctu_h, ctu_w, h, w, w_ctu)
    v = [_expand_ctu(vals[:, j], ctu_h, ctu_w, h, w, w_ctu)
         for j in range(6)]

    pad = jnp.pad(c, 1, mode="edge")
    n = [
        (pad[1:-1, :-2], pad[1:-1, 2:]),    # EO 0 deg
        (pad[:-2, 1:-1], pad[2:, 1:-1]),    # EO 90
        (pad[:-2, :-2], pad[2:, 2:]),       # EO 135
        (pad[:-2, 2:], pad[2:, :-2]),       # EO 45
    ]

    def sgn(a):
        return jnp.sign(a).astype(jnp.int32)

    edges = [sgn(c - a) + sgn(c - b) + 2 for a, b in n]
    edge = edges[0]
    for t in range(1, 4):
        edge = jnp.where(typ == t, edges[t], edge)
    off_eo = v[1]
    for j in range(1, 5):
        off_eo = jnp.where(edge == j, v[1 + j], off_eo)
    rel = (c >> band_shift) - v[0]
    off_bo = jnp.zeros_like(c)
    for j in range(4):
        off_bo = jnp.where((rel & 31) == j, v[1 + j], off_bo)
    off = jnp.where(typ == 4, off_bo, off_eo)
    # per-class picture-border trimming (sao_np._eo_mask with full
    # in-picture availability)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    on_x = (xs > 0) & (xs < w - 1)
    if row0 is not None:
        ys_abs = ys + row0
        on_y = (ys_abs > 0) & (ys_abs < img_h - 1)
    else:
        on_y = (ys > 0) & (ys < h - 1)
    mask = jnp.where(
        typ == 0, on_x,
        jnp.where(typ == 1, on_y,
                  jnp.where(typ == 4, jnp.full((h, w), True), on_x & on_y)))
    mask = mask & (typ != 255)
    out = jnp.clip(c + off, 0, pel_max)
    return jnp.where(mask, out, c).astype(plane.dtype)


# ======================================================================
# on-device CC-ALF (gather-free; VB row rules are compile-time masks)
# ======================================================================
@functools.lru_cache(maxsize=None)
def _ccalf_dense_core(h: int, w: int, hc: int, wc: int, bd: int,
                      sub_w: int, sub_h: int, ctu: int, w_ctu: int,
                      n_cc: int):
    """CC-ALF correction computed densely at luma resolution (constant
    pad+slice taps, per-row VB offset variants as static row masks),
    then subsampled to the chroma grid via reshape/transpose — no
    gathers.  Parity: filterBlkCcAlf (AdaptiveLoopFilter.cpp:1348) /
    ops.pipeline._ccalf_core."""
    pel_max = (1 << bd) - 1
    half = (1 << bd) >> 1
    sy, sx = sub_h - 1, sub_w - 1
    vb_h, vb_pos = ctu, ctu - 4
    ctu_h = -(-h // ctu)

    # static per-luma-row offset-variant masks (cf. _alf_inputs cc_off)
    ly = np.arange(h)
    pos = ly & (vb_h - 1)
    rz = (pos == vb_pos - 1) | (pos == vb_pos)          # o1=o2=o3=0
    r31 = (pos == vb_pos - 2) | (pos == vb_pos + 1)     # o3 = o1
    rz_m = jnp.asarray(rz[:, None])
    r31_m = jnp.asarray(r31[:, None])
    # chroma-row skip (444 only: collocated luma row on the VB rows)
    yc = np.arange(hc)
    posc = (yc << sy) & (vb_h - 1)
    skip_c = (sy == 0) & ((posc == vb_pos) | (posc == vb_pos + 1))
    skip_m = jnp.asarray(skip_c[:, None])

    def _sub(a):
        """[h, w] -> [hc, wc] at (y << sy, x << sx), no strided slices."""
        if sy:
            a = a.reshape(h >> sy, 1 << sy, w)[:, 0, :]
        if sx:
            a = a.T.reshape(w >> sx, 1 << sx, hc)[:, 0, :].T
        return a

    def apply(luma, dst, cc_banks, cc_ctu):
        sl = luma.astype(jnp.int32)
        pad = jnp.pad(sl, ((1, 2), (1, 1)), mode="edge")

        def L(dy, dx):
            return pad[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

        curr = L(0, 0)
        t0 = jnp.where(rz_m, curr, L(-1, 0))            # off2 tap
        t3 = jnp.where(rz_m, L(0, -1), L(1, -1))        # off1 taps
        t4 = jnp.where(rz_m, curr, L(1, 0))
        t5 = jnp.where(rz_m, L(0, 1), L(1, 1))
        t6 = jnp.where(rz_m, curr,
                       jnp.where(r31_m, L(1, 0), L(2, 0)))  # off3 tap
        # per-pixel coefficients: CTU broadcast + static bank select
        cidx = _expand_ctu(cc_ctu, ctu, ctu, h, w, w_ctu)
        acc = jnp.zeros((h, w), dtype=jnp.int32)
        taps = (t0, L(0, -1), L(0, 1), t3, t4, t5, t6)
        for k in range(7):
            ck = jnp.zeros((), dtype=jnp.int32)
            ck = jnp.broadcast_to(ck, (h, w))
            for j in range(1, n_cc):
                ck = jnp.where(cidx == j, cc_banks[j, k], ck)
            acc = acc + ck * (taps[k] - curr)
        acc = (acc + 64) >> 7
        acc = jnp.clip(acc + half, 0, pel_max) - half
        acc_c = _sub(acc)
        cidx_c = _sub(cidx)
        d = dst.astype(jnp.int32)
        out = jnp.clip(acc_c + d, 0, pel_max)
        use = (cidx_c != 0) & ~skip_m
        return jnp.where(use, out, d).astype(dst.dtype)

    return apply


# ======================================================================
# chain assembly
# ======================================================================
def _rep4(a, h, w):
    return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)[:h, :w]


def _flat_layout(key):
    """Static (name, shape) list describing the packed parameter vector —
    all per-frame parameters ride ONE host->device int16 transfer (the
    tunnel charges ~10 ms latency per transfer, so count matters more
    than bytes; every field fits 15 bits, asserted at pack time)."""
    (h, w, hc, wc, bd, ctu, sub_w, sub_h, num_comp, w_ctu,
     db_on, n_sl, sao_on, alf_luma, alf_chroma, cc_on, n_banks, n_cb,
     n_cc, pack_pad) = key
    h_ctu = -(-h // ctu)
    n_ctu = w_ctu * h_ctu
    h4g, w4g = h // 4, w // 4
    out = []
    if db_on:
        out.append(("db_y", (2, h4g, w4g)))
        if num_comp > 1:
            out.append(("db_cb", (2, h4g, w4g)))
            out.append(("db_cr", (2, h4g, w4g)))
        if n_sl > 1:
            out.append(("db_si", (h4g, w4g)))
        out.append(("db_sltab", (n_sl, 6)))
    if sao_on:
        out.append(("sao_type", (num_comp, n_ctu)))
        out.append(("sao_vals", (num_comp, n_ctu, 6)))
    if alf_luma or alf_chroma or cc_on:
        out += [("en_y", (n_ctu,)), ("set_ctu", (n_ctu,)),
                ("en_c", (2, n_ctu)), ("alt_ctu", (2, n_ctu)),
                ("cc_ctu", (2, n_ctu)),
                ("banks_co", (n_banks, 4, 25, 13)),
                ("banks_cl", (n_banks, 4, 25, 13)),
                ("cbanks_co", (n_cb, 7)), ("cbanks_cl", (n_cb, 7)),
                ("cc_banks", (n_cc, 7))]
    return out


def _flat_pack(key, arrays: dict) -> np.ndarray:
    parts = []
    for name, shape in _flat_layout(key):
        a = np.ascontiguousarray(arrays[name], dtype=np.int32)
        assert a.shape == shape, (name, a.shape, shape)
        assert a.min() >= -32768 and a.max() < 32768, (name, "int16 range")
        parts.append(a.reshape(-1).astype(np.int16))
    if not parts:
        return np.zeros(1, dtype=np.int16)
    return np.concatenate(parts)


def _flat_unpack(key, flat):
    out = {}
    pos = 0
    for name, shape in _flat_layout(key):
        n = int(np.prod(shape))
        out[name] = flat[pos:pos + n].reshape(shape).astype(jnp.int32)
        pos += n
    return out


@functools.lru_cache(maxsize=None)
def _chain_fn(key):
    """Build + jit the whole-frame filter chain for one static config."""
    (h, w, hc, wc, bd, ctu, sub_w, sub_h, num_comp, w_ctu,
     db_on, n_sl, sao_on, alf_luma, alf_chroma, cc_on, n_banks, n_cb,
     n_cc, pack_pad) = key
    ctu_log2 = ctu.bit_length() - 1
    pel_max = (1 << bd) - 1
    h4, w4 = h // 4, w // 4
    h_ctu = -(-h // ctu)
    vb_luma_h, vb_luma_pos = ctu, ctu - 4
    vb_chma_h = ctu // sub_h
    vb_chma_pos = vb_chma_h - 2

    if db_on:
        db_y = [deblock_luma_dense_core(h, w, bd, ctu, False, n_sl),
                deblock_luma_dense_core(w, h, bd, ctu, True, n_sl)]
        db_c = []
        if num_comp > 1:
            ctu_c = ctu // sub_h
            for d in range(2):
                L = 4 // (sub_h if d == 0 else sub_w)
                fy = 4 // (sub_h if d == 0 else sub_w)
                fx = 4 // (sub_w if d == 0 else sub_h)
                dims = (hc, wc) if d == 0 else (wc, hc)
                db_c.append([
                    deblock_chroma_dense_core(
                        dims[0], dims[1], bd, ctu_c, L, d == 1, fy, fx,
                        n_sl, comp) for comp in (1, 2)])

    alf_luma_fn = _alf_diamond_dense_core(
        h, w, bd, 12, vb_luma_h, vb_luma_pos, False) if alf_luma else None
    alf_chroma_fn = _alf_diamond_dense_core(
        hc, wc, bd, 6, vb_chma_h, vb_chma_pos, True) if alf_chroma else None
    cc_fn = _ccalf_dense_core(h, w, hc, wc, bd, sub_w, sub_h, ctu,
                              w_ctu, n_cc) if cc_on else None

    def pack(planes):
        flat = jnp.concatenate([p.reshape(-1) for p in planes])
        if pack_pad:
            flat = jnp.pad(flat, (0, pack_pad))
        if bd <= 8:
            return flat.astype(jnp.uint8)
        g = flat.reshape(-1, 4)
        b0 = g[:, 0] & 255
        b1 = (g[:, 0] >> 8) | ((g[:, 1] & 63) << 2)
        b2 = (g[:, 1] >> 6) | ((g[:, 2] & 15) << 4)
        b3 = (g[:, 2] >> 4) | ((g[:, 3] & 3) << 6)
        b4 = g[:, 3] >> 2
        return jnp.stack([b0, b1, b2, b3, b4], -1).astype(jnp.uint8) \
            .reshape(-1)

    def chain(planes, flat):
        planes = list(planes)
        P = _flat_unpack(key, flat)
        # ---- deblocking: per direction luma then chroma ----
        if db_on:
            sltab = P["db_sltab"]
            si = P["db_si"] if n_sl > 1 else \
                jnp.zeros((h // 4, w // 4), dtype=jnp.int32)
            planes[0] = db_y[0](planes[0], P["db_y"][0], si, sltab)
            if num_comp > 1:
                for k, nm in enumerate(("db_cb", "db_cr")):
                    planes[1 + k] = db_c[0][k](planes[1 + k], P[nm][0],
                                               si, sltab)
            planes[0] = db_y[1](planes[0].T, P["db_y"][1].T, si.T,
                                sltab).T
            if num_comp > 1:
                for k, nm in enumerate(("db_cb", "db_cr")):
                    planes[1 + k] = db_c[1][k](planes[1 + k].T,
                                               P[nm][1].T, si.T,
                                               sltab).T
        # ---- SAO ----
        if sao_on:
            for comp in range(num_comp):
                cw_ = (ctu // sub_w) if comp else ctu
                ch_ = (ctu // sub_h) if comp else ctu
                ph_, pw_ = (hc, wc) if comp else (h, w)
                planes[comp] = _sao_plane(
                    planes[comp], P["sao_type"][comp],
                    P["sao_vals"][comp],
                    h=ph_, w=pw_, ctu_w=cw_, ctu_h=ch_, w_ctu=w_ctu,
                    bd=bd)
        # ---- ALF (reads post-SAO, writes fresh buffers) ----
        out = list(planes)
        if alf_luma or alf_chroma or cc_on:
            en_y = P["en_y"]
            set_ctu = P["set_ctu"]
            en_c = P["en_c"]
            alt_ctu = P["alt_ctu"]
            cc_ctu = P["cc_ctu"]
            banks_co = P["banks_co"]
            banks_cl = P["banks_cl"]
            cbanks_co = P["cbanks_co"]
            cbanks_cl = P["cbanks_cl"]
            cc_banks = P["cc_banks"]
            ctu4 = ctu >> 2
            if alf_luma:
                cls, tr = _classify_dense(planes[0], h, w, bd, vb_luma_h,
                                          vb_luma_pos)
                set4 = _expand_ctu(set_ctu, ctu4, ctu4, h4, w4, w_ctu)
                co4 = banks_co[set4, tr, cls][:, :, :12]
                cl4 = banks_cl[set4, tr, cls][:, :, :12]
                co = _rep4(co4, h, w)
                cl = _rep4(cl4, h, w)
                mask = _rep4(_expand_ctu(en_y, ctu4, ctu4, h4, w4,
                                         w_ctu), h, w) != 0
                out[0] = alf_luma_fn(planes[0], co, cl, mask)
            if num_comp > 1 and (alf_chroma or cc_on):
                hc4, wc4 = (hc + 3) >> 2, (wc + 3) >> 2
                lc4w = (ctu // sub_w) >> 2
                lc4h = (ctu // sub_h) >> 2
                for k in range(2):
                    comp = 1 + k
                    if alf_chroma:
                        en4 = _expand_ctu(en_c[k], lc4h, lc4w, hc4, wc4,
                                          w_ctu)
                        alt4 = _expand_ctu(alt_ctu[k], lc4h, lc4w, hc4,
                                           wc4, w_ctu)
                        co4 = cbanks_co[alt4][:, :, :6]
                        cl4 = cbanks_cl[alt4][:, :, :6]
                        co = _rep4(co4, hc, wc)
                        cl = _rep4(cl4, hc, wc)
                        maskc = _rep4(en4, hc, wc) != 0
                        out[comp] = alf_chroma_fn(
                            planes[comp], co, cl, maskc)
                    if cc_on:
                        out[comp] = cc_fn(planes[0], out[comp],
                                          cc_banks, cc_ctu[k])
        packed = pack(out[:num_comp])
        return tuple(out[:num_comp]), packed

    return jax.jit(chain)


# ======================================================================
# host-side input assembly
# ======================================================================
def _deblock_grid_inputs(cs):
    """Packed per-4x4-cell deblock grids (host strength derivation in
    C): {"db_y": [2, h4, w4], "db_cb"/"db_cr": same (chroma formats),
    "db_si": slice-index grid (multi-slice), "db_sltab": [n_sl, 6]
    per-slice tc/beta offsets}."""
    from vvdec_tpu.frame.deblock_np import Deblocker
    if all(s.deblocking_disabled for s in cs.shs):
        return None
    db = Deblocker(cs, None)
    db.derive_strengths()
    out = {
        "db_y": np.stack([pack_luma_grid(db.edges[0]),
                          pack_luma_grid(db.edges[1])]),
        "db_sltab": np.array(
            [[s.tc_offset_div2, s.beta_offset_div2,
              s.cb_tc_offset_div2, s.cb_beta_offset_div2,
              s.cr_tc_offset_div2, s.cr_beta_offset_div2]
             for s in cs.shs], dtype=np.int32),
    }
    if cs.num_comp > 1:
        out["db_cb"] = np.stack([pack_chroma_grid(db.edges[0], 1),
                                 pack_chroma_grid(db.edges[1], 1)])
        out["db_cr"] = np.stack([pack_chroma_grid(db.edges[0], 2),
                                 pack_chroma_grid(db.edges[1], 2)])
    if len(cs.shs) > 1:
        out["db_si"] = np.clip(cs.slice_map, 0, len(cs.shs) - 1) \
            .astype(np.int16)
    return out


def _sao_inputs(cs):
    """Per-CTU SAO tensors: type per comp [n_ctu] (255 off) + compact
    values [n_ctu, 6] — EO: (_, o0..o4); BO: (band, b0..b3, _)."""
    if not any(s_.sao_enabled_luma or s_.sao_enabled_chroma
               for s_ in cs.shs):
        return None
    w_ctu = cs.pps.pic_width_in_ctu
    h_ctu = cs.pps.pic_height_in_ctu
    n_ctu = w_ctu * h_ctu
    types = np.full((cs.num_comp, n_ctu), 255, dtype=np.int32)
    vals = np.zeros((cs.num_comp, n_ctu, 6), dtype=np.int32)
    for addr in range(n_ctu):
        params = cs.sao_params[addr]
        if params is None:
            continue
        for comp in range(cs.num_comp):
            p = params[comp]
            if p["mode"] == 0:
                continue
            t = int(p["type"])
            types[comp, addr] = t
            if t == 4:
                band = int(p["band"])
                vals[comp, addr, 0] = band
                for k in range(4):
                    vals[comp, addr, 1 + k] = p["offsets"][(band + k)
                                                           % 32]
            else:
                vals[comp, addr, 1:6] = p["offsets"]
    if (types == 255).all():
        return None
    return types, vals


def _alf_inputs(cs, bd: int):
    """Per-CTU ALF tensors + stacked banks (host coefficient build)."""
    from vvdec_tpu.frame.alf_np import (
        NUM_FIXED_FILTER_SETS, build_chroma_coeff, build_fixed_sets,
        build_luma_coeff)
    if not any(any(s_.alf_enabled) or s_.ccalf_cb_enabled
               or s_.ccalf_cr_enabled for s_ in cs.shs):
        return None
    ctu = cs.sps.ctu_size
    w_ctu = cs.pps.pic_width_in_ctu
    h_ctu = cs.pps.pic_height_in_ctu
    n_ctu = w_ctu * h_ctu

    fixed_sets, fixed_clip = build_fixed_sets(bd)
    luma_tables = {}
    for si, s_ in enumerate(cs.shs):
        for i, aps_id in enumerate(s_.alf_aps_ids_luma):
            aps = cs.alf_apss[aps_id]
            luma_tables[(si, i)] = build_luma_coeff(aps.alf, bd)

    bank_key_to_id: dict = {}
    banks_co: list = []
    banks_cl: list = []

    def bank_id(si, idx):
        key = ("fixed", idx) if idx < NUM_FIXED_FILTER_SETS else (si, idx)
        if key not in bank_key_to_id:
            if idx < NUM_FIXED_FILTER_SETS:
                co, cl = fixed_sets[idx], fixed_clip
            else:
                co, cl = luma_tables[(si, idx - NUM_FIXED_FILTER_SETS)]
            bank_key_to_id[key] = len(banks_co)
            banks_co.append(co)
            banks_cl.append(cl)
        return bank_key_to_id[key]

    # chroma banks: per (slice alt) pair; cc banks
    cbank_ids: dict = {}
    cbanks_co: list = []
    cbanks_cl: list = []
    cc_bank_ids: dict = {}
    cc_banks: list = [np.zeros(7, dtype=np.int64)]

    en_y = np.zeros(n_ctu, dtype=np.int32)
    set_ctu = np.zeros(n_ctu, dtype=np.int32)
    en_c = np.zeros((2, n_ctu), dtype=np.int32)
    alt_ctu = np.zeros((2, n_ctu), dtype=np.int32)
    cc_ctu = np.zeros((2, n_ctu), dtype=np.int32)
    any_luma = any_chroma = any_cc = False
    for ry in range(h_ctu):
        for rx in range(w_ctu):
            addr = ry * w_ctu + rx
            p = cs.alf_params[addr]
            if p is None:
                continue
            si = int(cs.slice_map[(ry * ctu) >> 2, (rx * ctu) >> 2])
            sh = cs.shs[si if 0 <= si < len(cs.shs) else 0]
            if sh.alf_enabled[0] and p["enable"][0]:
                any_luma = True
                en_y[addr] = 1
                set_ctu[addr] = bank_id(si, p["filt_idx"])
            if cs.num_comp > 1:
                for k, comp in enumerate((1, 2)):
                    if sh.alf_enabled[comp] and p["enable"][comp]:
                        any_chroma = True
                        en_c[k, addr] = 1
                        ckey = (sh.alf_aps_id_chroma, p["alt"][k])
                        if ckey not in cbank_ids:
                            aps = cs.alf_apss[sh.alf_aps_id_chroma]
                            co, cl = build_chroma_coeff(aps.alf,
                                                        p["alt"][k], bd)
                            cbank_ids[ckey] = len(cbanks_co)
                            cbanks_co.append(co)
                            cbanks_cl.append(cl)
                        alt_ctu[k, addr] = cbank_ids[ckey]
                    cc_i = p["cc"][k]
                    cc_en = sh.ccalf_cb_enabled if comp == 1 \
                        else sh.ccalf_cr_enabled
                    if cc_en and cc_i:
                        any_cc = True
                        aps_id = sh.ccalf_cb_aps_id if comp == 1 \
                            else sh.ccalf_cr_aps_id
                        ckey = (aps_id, comp, cc_i)
                        if ckey not in cc_bank_ids:
                            aps = cs.alf_apss[aps_id]
                            cc_bank_ids[ckey] = len(cc_banks)
                            cc_banks.append(np.asarray(
                                aps.cc_alf.coeff[comp - 1][cc_i - 1],
                                dtype=np.int64))
                        cc_ctu[k, addr] = cc_bank_ids[ckey]
    if not (any_luma or any_chroma or any_cc):
        return None
    return {
        "any": (any_luma, any_chroma and cs.num_comp > 1,
                any_cc and cs.num_comp > 1),
        "arrays": (
            en_y, set_ctu, en_c, alt_ctu, cc_ctu,
            np.asarray(banks_co, dtype=np.int32).reshape(
                max(1, len(banks_co)), 4, 25, 13),
            np.asarray(banks_cl, dtype=np.int32).reshape(
                max(1, len(banks_cl)), 4, 25, 13),
            np.asarray(cbanks_co, dtype=np.int32)
            if cbanks_co else np.zeros((1, 7), dtype=np.int32),
            np.asarray(cbanks_cl, dtype=np.int32)
            if cbanks_cl else np.ones((1, 7), dtype=np.int32),
            np.asarray(cc_banks, dtype=np.int32)),
    }


class PendingFrame:
    """In-flight device filter result: device arrays + async packed copy."""

    __slots__ = ("planes_dev", "packed", "shapes", "bd", "pad", "_planes")

    def __init__(self, planes_dev, packed, shapes, bd, pad):
        self.planes_dev = planes_dev
        self.packed = packed
        self.shapes = shapes
        self.bd = bd
        self.pad = pad
        self._planes = None

    def resolve(self) -> list[np.ndarray]:
        """Blocking readback -> int32 planes (unpacked on host)."""
        if self._planes is None:
            raw = np.asarray(self.packed)
            if self.bd <= 8:
                flat = raw.astype(np.int32)
            else:
                b = raw.reshape(-1, 5).astype(np.int32)
                flat = np.empty(b.shape[0] * 4, dtype=np.int32)
                flat[0::4] = b[:, 0] | ((b[:, 1] & 3) << 8)
                flat[1::4] = (b[:, 1] >> 2) | ((b[:, 2] & 15) << 6)
                flat[2::4] = (b[:, 2] >> 4) | ((b[:, 3] & 63) << 4)
                flat[3::4] = (b[:, 3] >> 6) | (b[:, 4] << 2)
            if self.pad:
                flat = flat[:-self.pad]
            planes = []
            pos = 0
            for (hh, ww) in self.shapes:
                planes.append(flat[pos:pos + hh * ww].reshape(hh, ww))
                pos += hh * ww
            self._planes = planes
            self.planes_dev = None
        return self._planes


@functools.lru_cache(maxsize=None)
def _chain_fn_batched(key):
    """vmap of the whole-frame chain over a leading frame axis: one
    device dispatch filters a whole batch of frames (GOP-resident
    decode; amortizes the per-dispatch link latency)."""
    (h, w, hc, wc, bd, ctu, sub_w, sub_h, num_comp, w_ctu,
     db_on, n_sl, sao_on, alf_luma, alf_chroma, cc_on, n_banks, n_cb,
     n_cc, pack_pad) = key
    core = _chain_fn.__wrapped__(key)
    return jax.jit(jax.vmap(core))


def _frame_key_arrays(cs, planes):
    """(key, arrays dict) for one picture — the static chain config and
    its packed parameters (shared by the single and batched paths)."""
    bd = cs.sps.bit_depth
    num_comp = cs.num_comp
    h, w = planes[0].shape
    hc, wc = planes[1].shape if num_comp > 1 else (1, 1)
    db = _deblock_grid_inputs(cs)
    sao = _sao_inputs(cs)
    alf = _alf_inputs(cs, bd)
    total = sum(p.size for p in planes[:num_comp])
    pack_pad = (-total) % 4 if bd > 8 else 0
    key = (h, w, hc, wc, bd, cs.sps.ctu_size, cs.sub_w, cs.sub_h,
           num_comp, cs.pps.pic_width_in_ctu, db is not None,
           len(cs.shs), sao is not None,
           bool(alf and alf["any"][0]), bool(alf and alf["any"][1]),
           bool(alf and alf["any"][2]),
           0 if not alf else alf["arrays"][5].shape[0],
           0 if not alf else alf["arrays"][7].shape[0],
           0 if not alf else alf["arrays"][9].shape[0], pack_pad)
    arrays = {}
    if db is not None:
        arrays.update(db)
    if sao is not None:
        arrays["sao_type"] = sao[0][:num_comp]
        arrays["sao_vals"] = sao[1][:num_comp]
    if alf is not None:
        names = ("en_y", "set_ctu", "en_c", "alt_ctu", "cc_ctu",
                 "banks_co", "banks_cl", "cbanks_co", "cbanks_cl",
                 "cc_banks")
        for name, a in zip(names, alf["arrays"]):
            arrays[name] = a
    return key, arrays


def filter_frames_device_batch(items) -> list[PendingFrame]:
    """Filter a batch of same-config pictures [(cs, planes), ...] in ONE
    jitted dispatch (frames stacked on a leading axis).  All pictures
    must share the static chain config; per-frame parameters ride the
    stacked int16 vector."""
    per = [_frame_key_arrays(cs, planes) for cs, planes in items]
    key = per[0][0]
    assert all(k == key for k, _ in per), \
        "frames in one device batch must share the static chain config"
    num_comp = key[8]
    bd = key[4]
    pack_pad = key[-1]
    fn = _chain_fn_batched(key)
    flats = np.stack([_flat_pack(key, arrays) for _, arrays in per])
    planes_in = tuple(
        jnp.asarray(np.stack([np.asarray(planes[c])
                              for _, planes in items]))
        for c in range(num_comp))
    out_planes, packed = fn(planes_in, jnp.asarray(flats))
    try:
        packed.copy_to_host_async()
    except AttributeError:
        pass
    res = []
    for i, (cs, planes) in enumerate(items):
        shapes = [p.shape for p in planes[:num_comp]]
        res.append(PendingFrame(
            tuple(o[i] for o in out_planes), packed[i], shapes, bd,
            pack_pad))
    return res


def filter_frame_device(cs, planes: list[np.ndarray]) -> PendingFrame:
    """Dispatch the device filter chain for one reconstructed frame.
    Returns a PendingFrame (async readback already started)."""
    bd = cs.sps.bit_depth
    num_comp = cs.num_comp
    h, w = planes[0].shape
    hc, wc = planes[1].shape if num_comp > 1 else (1, 1)
    db = _deblock_grid_inputs(cs)
    sao = _sao_inputs(cs)
    alf = _alf_inputs(cs, bd)

    total = sum(p.size for p in planes[:num_comp])
    pack_pad = (-total) % 4 if bd > 8 else 0
    key = (h, w, hc, wc, bd, cs.sps.ctu_size, cs.sub_w, cs.sub_h,
           num_comp, cs.pps.pic_width_in_ctu, db is not None,
           len(cs.shs), sao is not None,
           bool(alf and alf["any"][0]), bool(alf and alf["any"][1]),
           bool(alf and alf["any"][2]),
           0 if not alf else alf["arrays"][5].shape[0],
           0 if not alf else alf["arrays"][7].shape[0],
           0 if not alf else alf["arrays"][9].shape[0], pack_pad)
    fn = _chain_fn(key)
    arrays = {}
    if db is not None:
        arrays.update(db)
    if sao is not None:
        arrays["sao_type"] = sao[0][:num_comp]
        arrays["sao_vals"] = sao[1][:num_comp]
    if alf is not None:
        names = ("en_y", "set_ctu", "en_c", "alt_ctu", "cc_ctu",
                 "banks_co", "banks_cl", "cbanks_co", "cbanks_cl",
                 "cc_banks")
        for name, a in zip(names, alf["arrays"]):
            arrays[name] = a
    flat = jnp.asarray(_flat_pack(key, arrays))
    planes_in = tuple(jnp.asarray(p) for p in planes[:num_comp])
    out_planes, packed = fn(planes_in, flat)
    try:
        packed.copy_to_host_async()
    except AttributeError:
        pass
    shapes = [p.shape for p in planes[:num_comp]]
    return PendingFrame(out_planes, packed, shapes, bd, pack_pad)
