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

from vvdec_tpu.ops.pipeline import (
    _alf_diamond_dense_core,
    _ccalf_core,
    _deblock_chroma_cells_core,
    _deblock_luma_cells_core,
    _pad_pow2,
)

_ACT_TH = np.array((0, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3, 4),
                   dtype=np.int32)
_TRANSPOSE = np.array((0, 1, 0, 2, 2, 3, 1, 3), dtype=np.int32)


def device_filter_eligible(cs) -> bool:
    """Whether the device chain models this picture's filter config."""
    if cs.sps.bit_depth > 10:
        return False
    vbx, vby = cs.virtual_boundaries()
    if vbx or vby:
        return False
    if cs.subpics:
        return False
    if len(cs.shs) > 1 and not cs.pps.loop_filter_across_slices:
        return False
    if not cs.pps.no_pic_partition \
            and not cs.pps.loop_filter_across_tiles:
        return False
    return True


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
# on-device SAO with per-CTU parameter expansion
# ======================================================================
def _sao_plane(plane, sao_type, tables, *, h, w, log2cw, log2ch, w_ctu,
               bd):
    """SAO for one plane.  sao_type: [n_ctu] int32 (255 = off);
    tables: [n_ctu, 37].  Availability = in-picture (gated)."""
    pel_max = (1 << bd) - 1
    band_shift = bd - 5
    c = plane.astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ctu_idx = (ys >> log2ch) * w_ctu + (xs >> log2cw)
    typ = sao_type[ctu_idx]

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
    band = c >> band_shift
    idx = jnp.where(typ == 4, 5 + band, edge)
    off = tables[ctu_idx, idx]
    # per-class picture-border trimming (sao_np._eo_mask with full
    # in-picture availability)
    on_x = (xs > 0) & (xs < w - 1)
    on_y = (ys > 0) & (ys < h - 1)
    mask = jnp.where(
        typ == 0, on_x,
        jnp.where(typ == 1, on_y,
                  jnp.where(typ == 4, jnp.full((h, w), True), on_x & on_y)))
    mask = mask & (typ != 255)
    out = jnp.clip(c + off, 0, pel_max)
    return jnp.where(mask, out, c).astype(plane.dtype)


# ======================================================================
# chain assembly
# ======================================================================
def _expand_ctu4(vals, h4, w4, log2cw4, log2ch4, w_ctu):
    """Gather per-CTU values onto the 4x4 grid."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h4, w4), 1)
    return vals[(ys >> log2ch4) * w_ctu + (xs >> log2cw4)]


def _rep4(a, h, w):
    return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)[:h, :w]


def _flat_layout(key):
    """Static (name, shape) list describing the packed parameter vector —
    all per-frame parameters ride ONE host->device transfer (the tunnel
    charges ~10 ms latency per transfer, so count matters more than
    bytes)."""
    (h, w, hc, wc, bd, ctu, sub_w, sub_h, num_comp, w_ctu,
     db_n, sao_on, alf_luma, alf_chroma, cc_on, n_banks, n_cb, n_cc,
     pack_pad) = key
    h_ctu = -(-h // ctu)
    n_ctu = w_ctu * h_ctu
    out = []
    if db_n is not None:
        for i in range(6):
            if db_n[i]:
                out.append((f"db{i}_cells", (db_n[i], 2)))
                out.append((f"db{i}_prm", (db_n[i], 6)))
                out.append((f"db{i}_n", (1,)))
    if sao_on:
        out.append(("sao_type", (num_comp, n_ctu)))
        out.append(("sao_tab", (num_comp, n_ctu, 37)))
    if alf_luma or alf_chroma or cc_on:
        out += [("en_y", (n_ctu,)), ("set_ctu", (n_ctu,)),
                ("en_c", (2, n_ctu)), ("alt_ctu", (2, n_ctu)),
                ("cc_ctu", (2, n_ctu)),
                ("banks_co", (n_banks, 4, 25, 13)),
                ("banks_cl", (n_banks, 4, 25, 13)),
                ("cbanks_co", (n_cb, 7)), ("cbanks_cl", (n_cb, 7)),
                ("cc_banks", (n_cc, 7)),
                ("cc_off", (max(1, hc), 3)), ("cc_skip", (max(1, hc),))]
    return out


def _flat_pack(key, arrays: dict) -> np.ndarray:
    parts = []
    for name, shape in _flat_layout(key):
        a = np.ascontiguousarray(arrays[name], dtype=np.int32)
        assert a.shape == shape, (name, a.shape, shape)
        parts.append(a.reshape(-1))
    if not parts:
        return np.zeros(1, dtype=np.int32)
    return np.concatenate(parts)


def _flat_unpack(key, flat):
    out = {}
    pos = 0
    for name, shape in _flat_layout(key):
        n = int(np.prod(shape))
        out[name] = flat[pos:pos + n].reshape(shape)
        pos += n
    return out


@functools.lru_cache(maxsize=None)
def _chain_fn(key):
    """Build + jit the whole-frame filter chain for one static config."""
    (h, w, hc, wc, bd, ctu, sub_w, sub_h, num_comp, w_ctu,
     db_n, sao_on, alf_luma, alf_chroma, cc_on, n_banks, n_cb, n_cc,
     pack_pad) = key
    ctu_log2 = ctu.bit_length() - 1
    pel_max = (1 << bd) - 1
    h4, w4 = h // 4, w // 4
    vb_luma_h, vb_luma_pos = ctu, ctu - 4
    vb_chma_h = ctu // sub_h
    vb_chma_pos = vb_chma_h - 2

    db_fns = []
    if db_n is not None:
        for d in range(2):
            db_fns.append(
                _deblock_luma_cells_core(h, w, d, bd, ctu, db_n[d])
                if db_n[d] else None)
        for d in range(2):
            for k in range(2):
                i = 2 + d * 2 + k
                db_fns.append(
                    _deblock_chroma_cells_core(
                        hc, wc, d, bd, 4 // (sub_h if d == 0 else sub_w),
                        (sub_h if d == 0 else sub_w) - 1, db_n[i])
                    if db_n[i] else None)

    alf_luma_fn = _alf_diamond_dense_core(
        h, w, bd, 12, vb_luma_h, vb_luma_pos, False) if alf_luma else None
    alf_chroma_fn = _alf_diamond_dense_core(
        hc, wc, bd, 6, vb_chma_h, vb_chma_pos, True) if alf_chroma else None
    cc_fn = _ccalf_core(hc, wc, bd, sub_w - 1, sub_h - 1) if cc_on else None

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
        # ---- deblocking: V then H, luma + chroma ----
        if db_n is not None:
            for d in range(2):
                if db_fns[d] is not None:
                    planes[0] = db_fns[d](planes[0], P[f"db{d}_cells"],
                                          P[f"db{d}_prm"],
                                          P[f"db{d}_n"][0])
                for k in range(2):
                    i = 2 + d * 2 + k
                    if db_n[i]:
                        planes[1 + k] = db_fns[i](
                            planes[1 + k], P[f"db{i}_cells"],
                            P[f"db{i}_prm"], P[f"db{i}_n"][0])
        # ---- SAO ----
        if sao_on:
            for comp in range(num_comp):
                lw = (ctu_log2 - (sub_w - 1).bit_length()) if comp else \
                    ctu_log2
                lh = (ctu_log2 - (sub_h - 1).bit_length()) if comp else \
                    ctu_log2
                ph_, pw_ = (hc, wc) if comp else (h, w)
                planes[comp] = _sao_plane(
                    planes[comp], P["sao_type"][comp],
                    P["sao_tab"][comp],
                    h=ph_, w=pw_, log2cw=lw, log2ch=lh, w_ctu=w_ctu,
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
            cc_off_rows = P["cc_off"]
            cc_skip_rows = P["cc_skip"] != 0
            ctu4w = ctu >> 2
            log2c4 = ctu4w.bit_length() - 1
            if alf_luma:
                cls, tr = _classify_dense(planes[0], h, w, bd, vb_luma_h,
                                          vb_luma_pos)
                set4 = _expand_ctu4(set_ctu, h4, w4, log2c4, log2c4,
                                    w_ctu)
                co4 = banks_co[set4, tr, cls][:, :, :12]
                cl4 = banks_cl[set4, tr, cls][:, :, :12]
                co = _rep4(co4, h, w)
                cl = _rep4(cl4, h, w)
                mask = _rep4(_expand_ctu4(en_y, h4, w4, log2c4, log2c4,
                                          w_ctu), h, w) != 0
                out[0] = alf_luma_fn(planes[0], co, cl, mask)
            if num_comp > 1 and (alf_chroma or cc_on):
                hc4, wc4 = (hc + 3) >> 2, (wc + 3) >> 2
                lc4w = (ctu // sub_w) >> 2
                lc4h = (ctu // sub_h) >> 2
                l2w = lc4w.bit_length() - 1
                l2h = lc4h.bit_length() - 1
                for k in range(2):
                    comp = 1 + k
                    if alf_chroma:
                        en4 = _expand_ctu4(en_c[k], hc4, wc4, l2w, l2h,
                                           w_ctu)
                        alt4 = _expand_ctu4(alt_ctu[k], hc4, wc4, l2w,
                                            l2h, w_ctu)
                        co4 = cbanks_co[alt4][:, :, :6]
                        cl4 = cbanks_cl[alt4][:, :, :6]
                        co = _rep4(co4, hc, wc)
                        cl = _rep4(cl4, hc, wc)
                        maskc = _rep4(en4, hc, wc) != 0
                        out[comp] = alf_chroma_fn(
                            planes[comp], co, cl, maskc)
                    if cc_on:
                        ysc = jax.lax.broadcasted_iota(
                            jnp.int32, (hc, wc), 0)
                        xsc = jax.lax.broadcasted_iota(
                            jnp.int32, (hc, wc), 1)
                        cidx = cc_ctu[k][
                            (ysc >> (ctu_log2 - (sub_h - 1)))
                            * w_ctu + (xsc >> (ctu_log2 - (sub_w - 1)))]
                        coeff = cc_banks[cidx]
                        out[comp] = cc_fn(
                            planes[0], out[comp], coeff, cc_off_rows,
                            cc_skip_rows, 0, 0, w - 1, h - 1, cidx != 0)
        packed = pack(out[:num_comp])
        return tuple(out[:num_comp]), packed

    return jax.jit(chain)


# ======================================================================
# host-side input assembly
# ======================================================================
def _deblock_inputs(cs):
    """Compact deblock cell tensors (host strength derivation in C)."""
    from vvdec_tpu.frame.deblock_np import Deblocker
    if all(s.deblocking_disabled for s in cs.shs):
        return None, None
    db = Deblocker(cs, None)
    db.derive_strengths()
    multi = len(cs.shs) > 1
    n_pads = []
    arrays = []
    for dir_ in (0, 1):
        ep = db.edges[dir_]
        cells4 = np.argwhere(ep.bs_y > 0)
        if len(cells4):
            ys4, xs4 = cells4[:, 0], cells4[:, 1]
            n = len(cells4)
            n_pad = _pad_pow2(n)
            cells = np.zeros((n_pad, 2), dtype=np.int32)
            cells[:n, 0] = xs4 * 4
            cells[:n, 1] = ys4 * 4
            prm = np.zeros((n_pad, 6), dtype=np.int32)
            prm[:n, 0] = ep.bs_y[ys4, xs4]
            prm[:n, 1] = ep.qp_y[ys4, xs4]
            prm[:n, 2] = ep.max_fl_p[ys4, xs4]
            prm[:n, 3] = ep.max_fl_q[ys4, xs4]
            if not multi:
                prm[:n, 4] = cs.sh.tc_offset_div2
                prm[:n, 5] = cs.sh.beta_offset_div2
            else:
                si = np.clip(cs.slice_map[ys4, xs4], 0, len(cs.shs) - 1)
                prm[:n, 4] = np.array([s_.tc_offset_div2
                                       for s_ in cs.shs])[si]
                prm[:n, 5] = np.array([s_.beta_offset_div2
                                       for s_ in cs.shs])[si]
            n_pads.append(n_pad)
            arrays.append((cells, prm, np.int32(n)))
        else:
            n_pads.append(0)
            arrays.append(None)
    # chroma (order: dir0 cb, dir0 cr, dir1 cb, dir1 cr)
    chroma = []
    for dir_ in (0, 1):
        chroma.append(_chroma_cells(cs, db, dir_) if cs.num_comp > 1
                      else (None, None))
    for dir_ in (0, 1):
        for k in range(2):
            ent = chroma[dir_][k]
            if ent is None:
                n_pads.append(0)
                arrays.append(None)
            else:
                n_pads.append(ent[0].shape[0])
                arrays.append(ent)
    return tuple(n_pads), arrays


def _chroma_cells(cs, db, dir_):
    """Per-direction chroma cell tensors for (Cb, Cr) — mirrors
    ops/pipeline._deblock_chroma_dir_jax's assembly."""
    ep = db.edges[dir_]
    sh = cs.sh
    multi = len(cs.shs) > 1
    sub_w, sub_h = cs.sub_w, cs.sub_h
    cw, chh = cs.comp_size[1]
    perp_step = 8
    par_step = 4 // sub_h if dir_ == 0 else 4 // sub_w
    ctu_c_mask = (cs.sps.ctu_size // cs.sub_h) - 1
    c0s = np.arange(perp_step, (cw if dir_ == 0 else chh), perp_step)
    c1s = np.arange(0, (chh if dir_ == 0 else cw), par_step)
    if len(c0s) == 0 or len(c1s) == 0:
        return (None, None)
    if dir_ == 0:
        ccx_g = np.broadcast_to(c0s[None, :], (len(c1s), len(c0s)))
        ccy_g = np.broadcast_to(c1s[:, None], (len(c1s), len(c0s)))
    else:
        ccx_g = np.broadcast_to(c1s[:, None], (len(c1s), len(c0s)))
        ccy_g = np.broadcast_to(c0s[None, :], (len(c1s), len(c0s)))
    cx4_g = (ccx_g * sub_w) >> 2
    cy4_g = (ccy_g * sub_h) >> 2
    bs_cb_g = ep.bs_cb[cy4_g, cx4_g]
    bs_cr_g = ep.bs_cr[cy4_g, cx4_g]
    any_mask = (bs_cb_g > 0) | (bs_cr_g > 0)
    if not any_mask.any():
        return (None, None)
    ccx_a = ccx_g[any_mask].astype(np.int32)
    ccy_a = ccy_g[any_mask].astype(np.int32)
    cx4_a = cx4_g[any_mask]
    cy4_a = cy4_g[any_mask]
    hor_ctb = ((dir_ == 1) & ((ccy_a & ctu_c_mask) == 0)).astype(np.int32)
    if multi:
        si = np.clip(cs.slice_map[cy4_a, cx4_a], 0, len(cs.shs) - 1)
    out = []
    for comp in (1, 2):
        bs_col = (bs_cb_g if comp == 1 else bs_cr_g)[any_mask]
        large_col = ep.cmfl[cy4_a, cx4_a]
        sel = (bs_col == 2) | ((large_col != 0) & (bs_col == 1))
        if not sel.any():
            out.append(None)
            continue
        n = int(sel.sum())
        n_pad = _pad_pow2(n)
        cells = np.zeros((n_pad, 2), dtype=np.int32)
        cells[:n, 0] = ccx_a[sel]
        cells[:n, 1] = ccy_a[sel]
        prm = np.zeros((n_pad, 6), dtype=np.int32)
        prm[:n, 0] = bs_col[sel]
        prm[:n, 1] = (ep.qp_cb if comp == 1 else ep.qp_cr)[cy4_a,
                                                           cx4_a][sel]
        prm[:n, 2] = large_col[sel]
        if not multi:
            prm[:n, 3] = sh.cb_tc_offset_div2 if comp == 1 \
                else sh.cr_tc_offset_div2
            prm[:n, 4] = sh.cb_beta_offset_div2 if comp == 1 \
                else sh.cr_beta_offset_div2
        else:
            attr_tc = "cb_tc_offset_div2" if comp == 1 \
                else "cr_tc_offset_div2"
            attr_b = "cb_beta_offset_div2" if comp == 1 \
                else "cr_beta_offset_div2"
            prm[:n, 3] = np.array([getattr(s_, attr_tc)
                                   for s_ in cs.shs])[si[sel]]
            prm[:n, 4] = np.array([getattr(s_, attr_b)
                                   for s_ in cs.shs])[si[sel]]
        prm[:n, 5] = hor_ctb[sel]
        out.append((cells, prm, np.int32(n)))
    return tuple(out)


def _sao_inputs(cs):
    """Per-CTU SAO tensors: type per comp [n_ctu] (255 off), tables
    [n_ctu, 37]."""
    if not any(s_.sao_enabled_luma or s_.sao_enabled_chroma
               for s_ in cs.shs):
        return None
    w_ctu = cs.pps.pic_width_in_ctu
    h_ctu = cs.pps.pic_height_in_ctu
    n_ctu = w_ctu * h_ctu
    types = np.full((cs.num_comp, n_ctu), 255, dtype=np.int32)
    tables = np.zeros((cs.num_comp, n_ctu, 37), dtype=np.int32)
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
                tables[comp, addr, 5:] = p["offsets"]
            else:
                tables[comp, addr, :5] = p["offsets"]
    if (types == 255).all():
        return None
    return types, tables


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
    vb_luma_h, vb_luma_pos = ctu, ctu - 4
    if cs.num_comp > 1:
        hcc = cs.comp_size[1][1]
        # CC-ALF per-row luma offsets / VB skip rows
        cc_off = np.zeros((hcc, 3), dtype=np.int32)
        cc_skip = np.zeros(hcc, dtype=bool)
        sy = cs.sub_h - 1
        for y in range(hcc):
            ly = y << sy
            pos = ly & (vb_luma_h - 1)
            if sy == 0 and pos in (vb_luma_pos, vb_luma_pos + 1):
                cc_skip[y] = True
                continue
            o1, o2, o3 = 1, -1, 2
            if pos in (vb_luma_pos - 2, vb_luma_pos + 1):
                o3 = o1
            elif pos in (vb_luma_pos - 1, vb_luma_pos):
                o1 = o2 = o3 = 0
            cc_off[y] = (o1, o2, o3)
    else:
        cc_off = np.zeros((1, 3), dtype=np.int32)
        cc_skip = np.zeros(1, dtype=bool)
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
            np.asarray(cc_banks, dtype=np.int32),
            cc_off, cc_skip),
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


def filter_frame_device(cs, planes: list[np.ndarray]) -> PendingFrame:
    """Dispatch the device filter chain for one reconstructed frame.
    Returns a PendingFrame (async readback already started)."""
    bd = cs.sps.bit_depth
    num_comp = cs.num_comp
    h, w = planes[0].shape
    hc, wc = planes[1].shape if num_comp > 1 else (1, 1)
    db_n, db_arrays = _deblock_inputs(cs)
    sao = _sao_inputs(cs)
    alf = _alf_inputs(cs, bd)

    total = sum(p.size for p in planes[:num_comp])
    pack_pad = (-total) % 4 if bd > 8 else 0
    key = (h, w, hc, wc, bd, cs.sps.ctu_size, cs.sub_w, cs.sub_h,
           num_comp, cs.pps.pic_width_in_ctu, db_n,
           sao is not None,
           bool(alf and alf["any"][0]), bool(alf and alf["any"][1]),
           bool(alf and alf["any"][2]),
           0 if not alf else alf["arrays"][5].shape[0],
           0 if not alf else alf["arrays"][7].shape[0],
           0 if not alf else alf["arrays"][9].shape[0], pack_pad)
    fn = _chain_fn(key)
    arrays = {}
    if db_arrays is not None:
        for i, e in enumerate(db_arrays):
            if e is not None:
                arrays[f"db{i}_cells"] = e[0]
                arrays[f"db{i}_prm"] = e[1]
                arrays[f"db{i}_n"] = np.asarray([e[2]], dtype=np.int32)
    if sao is not None:
        arrays["sao_type"] = sao[0][:num_comp]
        arrays["sao_tab"] = sao[1][:num_comp]
    if alf is not None:
        names = ("en_y", "set_ctu", "en_c", "alt_ctu", "cc_ctu",
                 "banks_co", "banks_cl", "cbanks_co", "cbanks_cl",
                 "cc_banks", "cc_off", "cc_skip")
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
