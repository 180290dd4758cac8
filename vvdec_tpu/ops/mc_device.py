"""Device (TPU) inter-prediction kernel family.

Batched motion compensation over XLA: all blocks of one (w, h, taps)
class run as one program — patch extraction is a single sliced gather
(vmap of dynamic_slice over pre-padded reference planes, the P8
"pad-once" design), the separable FIR and every rounding/clipping step
are dense shifted adds at the reference's exact 14-bit intermediate
precision.

Key design point: fractional position 0 is NOT special-cased.  Running
the identity coefficient row ([..,64,..]) through the generic two-pass
path is bit-exact with the reference's copy/single-pass branches (the
64x gain cancels exactly against the pass shifts), so one uniform
kernel covers copy / H-only / V-only / HV, alt-half-pel and the RPR
coefficient sets — the host selects coefficient rows per block, the
device is phase-agnostic.

Parity targets: InterpolationFilter::filter{Hor,Ver} 14-bit pipeline
(/root/reference/source/Lib/CommonLib/InterpolationFilter.h:65-120),
InterPrediction::xPredInterBlk / xProcessDMVR / applyBiOptFlow
(InterPrediction.cpp:741,1847,1290); the host goldens are
frame/inter_np.mc_block, bi_average/bi_weighted and frame/dmvr_np.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

IF_INTERNAL_PREC = 14
IF_FILTER_PREC = 6
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)


def pad_ref(plane, margin: int):
    """Edge-replicated reference padding (Picture border extension done
    once per ref per frame on device — Picture.h:140)."""
    return jnp.pad(jnp.asarray(plane), margin, mode="edge")


@functools.lru_cache(maxsize=None)
def mc_batch_core(w: int, h: int, taps: int, bd: int, hp: int, wp: int,
                  n_refs: int):
    """Jitted batched MC for one block class.

    apply(refs [n_refs, hp, wp] int32 (pre-padded), y0, x0 [N] int32
    (patch origin in padded coords = y + iy - half + margin), ridx [N],
    cfy, cfx [N, taps] int32, inter [N] bool) ->
    pred [N, h, w] int32 (14-bit intermediate where inter, else final
    clipped sample)."""
    head = max(2, IF_INTERNAL_PREC - bd)
    s1 = IF_FILTER_PREC - head
    s2 = IF_FILTER_PREC + head
    off2 = (1 << (s2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    pel_max = (1 << bd) - 1
    eh, ew = h + taps - 1, w + taps - 1

    def apply(refs, y0, x0, ridx, cfy, cfx, inter):
        def one(r, y, x):
            return jax.lax.dynamic_slice(refs, (r, y, x), (1, eh, ew))[0]

        win = jax.vmap(one)(ridx, y0, x0).astype(jnp.int32)  # [N, eh, ew]
        # pass 1: horizontal FIR (isFirst, !isLast)
        tmp = jnp.zeros((win.shape[0], eh, w), dtype=jnp.int32)
        for k in range(taps):
            tmp = tmp + win[:, :, k: k + w] * cfx[:, k, None, None]
        tmp = (tmp - (IF_INTERNAL_OFFS << s1)) >> s1
        # pass 2: vertical FIR
        blk = jnp.zeros((win.shape[0], h, w), dtype=jnp.int32)
        for k in range(taps):
            blk = blk + tmp[:, k: k + h, :] * cfy[:, k, None, None]
        interm = blk >> IF_FILTER_PREC                 # (!isFirst,!isLast)
        final = jnp.clip((blk + off2) >> s2, 0, pel_max)
        return jnp.where(inter[:, None, None], interm, final)

    return jax.jit(apply)


@functools.lru_cache(maxsize=None)
def bi_combine_core(w: int, h: int, bd: int):
    """Jitted bi-prediction combine: default average and BCW weighted
    average in one kernel (AreaBuf::addAvg / addWeightedAvg).
    apply(a, b [N, h, w] int32 14-bit, w1 [N] int32 BCW weight (4 =
    default average)) -> [N, h, w] clipped samples."""
    head = max(2, IF_INTERNAL_PREC - bd)
    sh_avg = head + 1
    off_avg = (1 << (sh_avg - 1)) + 2 * IF_INTERNAL_OFFS
    sh_bcw = head + 3
    off_bcw = (1 << (sh_bcw - 1)) + (IF_INTERNAL_OFFS << 3)
    pel_max = (1 << bd) - 1

    def apply(a, b, w1):
        avg = jnp.clip((a + b + off_avg) >> sh_avg, 0, pel_max)
        w1e = w1[:, None, None]
        bcw = jnp.clip((a * (8 - w1e) + b * w1e + off_bcw) >> sh_bcw,
                       0, pel_max)
        return jnp.where(w1e == 4, avg, bcw)

    return jax.jit(apply)


@functools.lru_cache(maxsize=None)
def wp_combine_core(w: int, h: int, bd: int):
    """Jitted explicit weighted prediction on 14-bit intermediates
    (WeightPrediction::addWeightUni/addWeightBi, WeightPrediction.cpp:
    164,240).  apply(a, b [N, h, w], w0, o0, w1, o1, denom [N], bi [N]
    bool) -> clipped samples; for uni blocks b/w1/o1 are ignored."""
    shift_num = max(2, IF_INTERNAL_PREC - bd)
    offs = 1 << 13
    pel_max = (1 << bd) - 1

    def apply(a, b, w0, o0, w1, o1, denom, bi):
        sh_u = (denom + shift_num)[:, None, None]
        rnd_u = jnp.where(sh_u > 0, 1 << jnp.maximum(sh_u - 1, 0), 0)
        uni = ((w0[:, None, None] * (a + offs) + rnd_u) >> sh_u) \
            + o0[:, None, None]
        sh_b = (denom + 1 + shift_num)[:, None, None]
        rnd_b = 1 << jnp.maximum(sh_b - 1, 0)
        off = (o0 + o1)[:, None, None]
        bi_v = (w0[:, None, None] * (a + offs)
                + w1[:, None, None] * (b + offs)
                + rnd_b + (off << (sh_b - 1))) >> sh_b
        v = jnp.where(bi[:, None, None], bi_v, uni)
        return jnp.clip(v, 0, pel_max)

    return jax.jit(apply)


# DMVR search offsets, raster order (xProcessDMVR's 25-point pattern)
_DMVR_OFFS = tuple((hor, ver) for ver in range(-2, 3)
                   for hor in range(-2, 3))


@functools.lru_cache(maxsize=None)
def dmvr_sad25_core(dx: int, dy: int):
    """Jitted 25-point DMVR SAD: bl0/bl1 [N, dy+4, dx+4] 10-bit bilinear
    blocks (centre at (2,2)); SAD over even rows (subShift=1, RdCost SAD
    with the callers' >>1 pre-applied) at mirrored offsets ->
    [N, 25] int32, raster (ver -2..2) x (hor -2..2)."""

    def apply(bl0, bl1):
        sads = []
        for hor, ver in _DMVR_OFFS:
            a = bl0[:, 2 + ver: 2 + ver + dy, 2 + hor: 2 + hor + dx]
            b = bl1[:, 2 - ver: 2 - ver + dy, 2 - hor: 2 - hor + dx]
            d = jnp.abs(a - b)
            d = d.reshape(d.shape[0], dy // 2, 2, dx)[:, :, 0, :]
            sads.append(d.sum(axis=(1, 2)))
        return jnp.stack(sads, axis=1)

    return jax.jit(apply)


def _bitlen(v, maxbits: int = 22):
    """int bit_length for v >= 0 (exact, via compares)."""
    n = jnp.zeros_like(v)
    for m in range(maxbits):
        n = n + (v >= (1 << m)).astype(v.dtype)
    return n


def _rshift_msb(numer, denom):
    """rightShiftMSB (InterPrediction.cpp:92), vectorized: arithmetic
    shift by floor(log2(denom)); denom >= 1."""
    sh = _bitlen(denom) - 1
    return numer >> sh


@functools.lru_cache(maxsize=None)
def bdof_blend_core(w: int, h: int, bd: int):
    """Jitted batched BDOF blend (applyBiOptFlow / BiOptFlowCore):
    apply(ext0, ext1 [N, h+2, w+2] int32 — 14-bit blocks with
    integer-sample borders) -> [N, h, w] clipped samples.  Per-4x4 flow
    windows run as static slices (h, w <= 16: the BDOF application
    region)."""
    shift_num = IF_INTERNAL_PREC + 1 - bd
    offset = (1 << (shift_num - 1)) + 2 * IF_INTERNAL_OFFS
    limit = 15
    pel_max = (1 << bd) - 1

    def apply(ext0, ext1):
        N = ext0.shape[0]

        def grads(ext):
            gx = jnp.zeros_like(ext)
            gy = jnp.zeros_like(ext)
            gx = gx.at[:, 1:h + 1, 1:w + 1].set(
                (ext[:, 1:h + 1, 2:w + 2] >> 6)
                - (ext[:, 1:h + 1, 0:w] >> 6))
            gy = gy.at[:, 1:h + 1, 1:w + 1].set(
                (ext[:, 2:h + 2, 1:w + 1] >> 6)
                - (ext[:, 0:h, 1:w + 1] >> 6))
            out = []
            for a in (gx, gy, ext):
                a = a.at[:, 1:h + 1, 0].set(a[:, 1:h + 1, 1])
                a = a.at[:, 1:h + 1, w + 1].set(a[:, 1:h + 1, w])
                a = a.at[:, 0, :].set(a[:, 1, :])
                a = a.at[:, h + 1, :].set(a[:, h, :])
                out.append(a)
            return out

        gx0, gy0, e0 = grads(ext0)
        gx1, gy1, e1 = grads(ext1)
        out = jnp.zeros((N, h, w), dtype=jnp.int32)
        for yu in range(h >> 2):
            for xu in range(w >> 2):
                ya, xa = yu * 4, xu * 4
                sl = (slice(None), slice(ya, ya + 6), slice(xa, xa + 6))
                tgx = (gx0[sl] + gx1[sl]) >> 1
                tgy = (gy0[sl] + gy1[sl]) >> 1
                tdi = (e1[sl] >> 4) - (e0[sl] >> 4)
                sgx = jnp.sign(tgx)
                sgy = jnp.sign(tgy)
                sum_abs_gx = jnp.abs(tgx).sum(axis=(1, 2))
                sum_abs_gy = jnp.abs(tgy).sum(axis=(1, 2))
                sum_dix = (sgx * tdi).sum(axis=(1, 2))
                sum_diy = (sgy * tdi).sum(axis=(1, 2))
                sum_sgygx = (sgy * tgx).sum(axis=(1, 2))
                tmpx = jnp.where(
                    sum_abs_gx == 0, 0,
                    _rshift_msb(sum_dix * 4, jnp.maximum(sum_abs_gx, 1)))
                tmpx = jnp.clip(tmpx, -limit, limit)
                mains = sum_sgygx >> 12
                secs = sum_sgygx & 4095
                tmp_data = ((tmpx * mains) * (1 << 12) + tmpx * secs) >> 1
                tmpy = jnp.where(
                    sum_abs_gy == 0, 0,
                    _rshift_msb(sum_diy * 4 - tmp_data,
                                jnp.maximum(sum_abs_gy, 1)))
                tmpy = jnp.clip(tmpy, -limit, limit)
                isl = (slice(None), slice(ya + 1, ya + 5),
                       slice(xa + 1, xa + 5))
                bterm = tmpx[:, None, None] * (gx0[isl] - gx1[isl]) \
                    + tmpy[:, None, None] * (gy0[isl] - gy1[isl])
                val = jnp.clip(
                    (e0[isl] + e1[isl] + bterm + offset) >> shift_num,
                    0, pel_max)
                out = out.at[:, ya:ya + 4, xa:xa + 4].set(val)
        return out

    return jax.jit(apply)


# ----------------------------------------------------------------------
# host-facing batch helpers (coefficient-row selection per block)
# ----------------------------------------------------------------------
def mc_coeff_rows(fracs, comp: int, alt_hpel=None, luma_table=None):
    """Per-block FIR coefficient rows.  fracs: [N] fraction indices
    (1/16 luma, 1/32 chroma); 0 maps to the identity row (uniform
    two-pass kernel).  alt_hpel: optional [N] bool (frac 8 -> 6-tap
    alternate half-pel)."""
    from vvdec_tpu.frame.inter_np import ALT_HPEL_IF, CHROMA_IF, LUMA_IF
    table = (luma_table if luma_table is not None else LUMA_IF) \
        if comp == 0 else CHROMA_IF
    taps = table.shape[1]
    rows = np.asarray(table, dtype=np.int32)[np.asarray(fracs)]
    ident = np.zeros(taps, dtype=np.int32)
    ident[taps // 2 - 1] = 64
    rows[np.asarray(fracs) == 0] = ident
    if comp == 0 and alt_hpel is not None:
        sel = np.asarray(alt_hpel) & (np.asarray(fracs) == 8)
        rows[sel] = ALT_HPEL_IF[:taps]
    return rows


# ----------------------------------------------------------------------
# frame-level device MC: batched prediction for all eligible inter CUs
# ----------------------------------------------------------------------
def _cu_mc_eligible(cs, cu) -> bool:
    """Translational whole-CU MC on device; everything with subblock
    motion, pixel-adaptive refinement or special gather windows stays on
    the host plane (the same split walk9.c's ix_cu_eligible makes)."""
    from vvdec_tpu.frame.dmvr_np import (bdof_condition, dmvr_condition,
                                         _wp_present)
    from vvdec_tpu.frame.structure import MODE_INTER
    if cu.pred_mode != MODE_INTER or cu.inter_dir not in (1, 2, 3):
        return False
    if cu.affine_flag or cu.geo_flag or cu.ciip_flag or cu.merge_type:
        return False
    if dmvr_condition(cs, cu) or bdof_condition(cs, cu):
        return False
    if cs.sps.ref_wraparound_enabled or cs.subpics:
        return False
    for lst in (0, 1):
        if cu.inter_dir & (1 << lst):
            if cu.ref_idx[lst] < 0 or \
                    cs.ref_scaled[lst][cu.ref_idx[lst]] is not None:
                return False
    return True


def mc_frame_device(cs, margin: int | None = None):
    """Batched device MC for every eligible inter CU of one picture.

    Groups CUs by (w, h); pads each referenced plane once; one
    mc_batch_core launch per (size class, component class) and one
    bi-combine launch per size class.  Returns {cu_idx: [pred planes]}
    with final clipped samples — bit-exact vs the host per-CU path
    (tests/test_mc_device.py::TestMcFrame)."""
    from vvdec_tpu.frame.inter_np import (
        BCW_INTERN, BCW_WEIGHTS, clip_mv)
    bd = cs.sps.bit_depth
    if margin is None:
        margin = cs.sps.ctu_size + 24
    groups: dict = {}
    for cu in cs.cus:
        if cu is None or not _cu_mc_eligible(cs, cu):
            continue
        groups.setdefault((cu.w, cu.h), []).append(cu)
    if not groups:
        return {}

    # pad each referenced plane once (by object identity)
    pads: dict = {}

    def padded(plane, m):
        key = (id(plane), m)
        ent = pads.get(key)
        if ent is None:
            ent = pads[key] = pad_ref(plane, m)
        return ent

    out: dict = {}
    for (w, h), cus in groups.items():
        N = len(cus)
        from vvdec_tpu.frame.dmvr_np import _wp_present
        wp_on = np.array([_wp_present(cs, cu) for cu in cus])
        # per-list 14-bit (bi or weighted) / final (plain uni) preds
        uni = np.array([cu.inter_dir != 3 for cu in cus]) & ~wp_on
        parts = [[None] * cs.num_comp, [None] * cs.num_comp]
        for lst in (0, 1):
            rows = [i for i, cu in enumerate(cus)
                    if cu.inter_dir & (1 << lst)]
            if not rows:
                continue
            # batch per component class (luma 8-tap; chroma 4-tap)
            for comp in range(cs.num_comp):
                sub = (cs.sub_w, cs.sub_h) if comp else (1, 1)
                taps = 8 if comp == 0 else 4
                half = taps // 2 - 1
                fxb = 4 + (cs.sub_w - 1) if comp else 4
                fyb = 4 + (cs.sub_h - 1) if comp else 4
                mlist = margin // sub[1]
                refs, ridx_map = [], {}
                y0 = np.zeros(len(rows), np.int32)
                x0 = np.zeros(len(rows), np.int32)
                ridx = np.zeros(len(rows), np.int32)
                fx = np.zeros(len(rows), np.int32)
                fy = np.zeros(len(rows), np.int32)
                alth = np.zeros(len(rows), bool)
                inter = np.zeros(len(rows), bool)
                for j, i in enumerate(rows):
                    cu = cus[i]
                    mvc = clip_mv(tuple(cu.mv[lst]), cu.x, cu.y, cs,
                                  size=(cu.w, cu.h))
                    plane = cs.ref_planes[lst][cu.ref_idx[lst]][comp]
                    k = id(plane)
                    if k not in ridx_map:
                        ridx_map[k] = len(refs)
                        refs.append(padded(plane, mlist))
                    ridx[j] = ridx_map[k]
                    ix, iy = mvc[0] >> fxb, mvc[1] >> fyb
                    f_x = mvc[0] & ((1 << fxb) - 1)
                    f_y = mvc[1] & ((1 << fyb) - 1)
                    if comp:
                        f_x <<= (5 - fxb)
                        f_y <<= (5 - fyb)
                    bx = cu.x if comp == 0 else cu.cx
                    by = cu.y if comp == 0 else cu.cy
                    x0[j] = bx + ix - half + mlist
                    y0[j] = by + iy - half + mlist
                    fx[j], fy[j] = f_x, f_y
                    alth[j] = cu.alt_hpel and comp == 0
                    inter[j] = cu.inter_dir == 3 or wp_on[i]
                import jax.numpy as jnp
                cfx = mc_coeff_rows(fx, min(comp, 1), alt_hpel=alth)
                cfy = mc_coeff_rows(fy, min(comp, 1), alt_hpel=alth)
                rstack = jnp.stack(refs)
                cw = w if comp == 0 else w // cs.sub_w
                ch = h if comp == 0 else h // cs.sub_h
                fn = mc_batch_core(cw, ch, taps, bd,
                                   int(rstack.shape[1]),
                                   int(rstack.shape[2]), len(refs))
                parts[lst][comp] = (rows, fn(
                    rstack, jnp.asarray(y0), jnp.asarray(x0),
                    jnp.asarray(ridx), jnp.asarray(cfy),
                    jnp.asarray(cfx), jnp.asarray(inter)))
        # combine
        import jax.numpy as jnp
        from vvdec_tpu.hls.weight_table import resolve_wp
        for comp in range(cs.num_comp):
            cw = w if comp == 0 else w // cs.sub_w
            ch = h if comp == 0 else h // cs.sub_h
            preds = [None] * N
            jmap = [None, None]
            for lst in (0, 1):
                if parts[lst][comp] is None:
                    continue
                rows, batch = parts[lst][comp]
                jmap[lst] = ({i: j for j, i in enumerate(rows)},
                             np.asarray(batch))
                for j, i in enumerate(rows):
                    if uni[i]:
                        preds[i] = jmap[lst][1][j]
            bi_rows = [i for i in range(N)
                       if not uni[i] and not wp_on[i]]
            if bi_rows:
                j0, b0 = jmap[0]
                j1, b1 = jmap[1]
                a = jnp.stack([b0[j0[i]] for i in bi_rows])
                b = jnp.stack([b1[j1[i]] for i in bi_rows])
                w1 = np.array(
                    [4 if cus[i].bcw_idx == 0
                     else BCW_WEIGHTS[BCW_INTERN[cus[i].bcw_idx]]
                     for i in bi_rows], dtype=np.int32)
                comb = np.asarray(bi_combine_core(cw, ch, bd)(
                    a, b, jnp.asarray(w1)))
                for j, i in enumerate(bi_rows):
                    preds[i] = comb[j]
            wp_rows = [i for i in range(N) if wp_on[i]]
            if wp_rows:
                zeros = np.zeros((ch, cw), dtype=np.int32)
                aL, bL = [], []
                w0a = np.zeros(len(wp_rows), np.int32)
                o0a = np.zeros(len(wp_rows), np.int32)
                w1a = np.zeros(len(wp_rows), np.int32)
                o1a = np.zeros(len(wp_rows), np.int32)
                dna = np.zeros(len(wp_rows), np.int32)
                bia = np.zeros(len(wp_rows), bool)
                for j, i in enumerate(wp_rows):
                    cu = cus[i]
                    wt = cs.sh_of(cu).weight_table
                    bia[j] = cu.inter_dir == 3
                    lst = 0 if cu.inter_dir in (1, 3) else 1
                    wp0 = resolve_wp(wt, lst, cu.ref_idx[lst], bd,
                                     cs.num_comp)[comp]
                    aL.append(jmap[lst][1][jmap[lst][0][i]])
                    w0a[j] = wp0["w"]
                    o0a[j] = wp0["o"]
                    dna[j] = wp0["denom"]
                    if bia[j]:
                        wp1 = resolve_wp(wt, 1, cu.ref_idx[1], bd,
                                         cs.num_comp)[comp]
                        bL.append(jmap[1][1][jmap[1][0][i]])
                        w1a[j] = wp1["w"]
                        o1a[j] = wp1["o"]
                    else:
                        bL.append(zeros)
                comb = np.asarray(wp_combine_core(cw, ch, bd)(
                    jnp.asarray(np.stack(aL)), jnp.asarray(np.stack(bL)),
                    jnp.asarray(w0a), jnp.asarray(o0a),
                    jnp.asarray(w1a), jnp.asarray(o1a),
                    jnp.asarray(dna), jnp.asarray(bia)))
                for j, i in enumerate(wp_rows):
                    preds[i] = comb[j]
            for i, cu in enumerate(cus):
                if preds[i] is not None:
                    out.setdefault(cu.idx, [None] * cs.num_comp)[comp] \
                        = preds[i]
    return out
