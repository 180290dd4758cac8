"""Device-resident whole-frame reconstruction pipeline.

`use_jax=True` decoding routes eligible pictures through this module:
dequant + inverse transform (batched per TU shape class, Pallas/XLA),
the sequential intra chain (ops/intra_device.py lax.scan), then the
whole-frame in-loop filter chain + 10-bit output packing
(ops/device_pipeline.py) — all in device memory.  The host uploads only
coefficient blocks and scalar descriptors and reads back one packed
buffer per frame; reconstructed planes never leave the device
mid-pipeline, and stay resident as DPB references for later frames.

This replaces the reference's per-CTU wavefront task machine
(DecLibRecon::decompressPicture, DecLibRecon.cpp:429-682) with
whole-frame batched device stages, the TPU-native design from
SURVEY.md §7.  Ineligible pictures fall back to the host plane with the
reason counted in StreamDecoder.fallback_census.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vvdec_tpu.frame.structure import MODE_INTRA, MTS_SKIP
from vvdec_tpu.ops.intra_device import (
    B,
    PB,
    build_intra_descriptors,
    run_intra_scan,
    scan_key,
)


@functools.lru_cache(maxsize=None)
def _scatter_fn(hp: int, wp: int, h: int, w: int, n: int):
    """Jitted block scatter: write n (h, w) blocks into a padded plane
    at (ys, xs); rectangles are disjoint per component (TU layout)."""

    @jax.jit
    def run(plane, blocks, ys, xs):
        def body(k, p):
            return lax.dynamic_update_slice(
                p, blocks[k], (ys[k], xs[k]))

        return lax.fori_loop(0, n, body, plane)

    return run


def itx_residual_device(cs) -> list:
    """Stage 1 on device: dequant + inverse (LFNST +) transform for every
    coded TU, scattered into padded per-component residual planes that
    stay in device memory (the intra scan and inter reconstruct slice
    them in place).  Parity: TrQuant::invTransformNxN (TrQuant.cpp:290);
    batching identical to ops/pipeline.itx_frame_jax."""
    from vvdec_tpu.frame.recon_np import (
        CHROMA422_MAP,
        co_located_luma_mode_of,
        get_tr_types,
        lfnst_params,
        scaling_matrix_for,
        tu_qp,
    )
    from vvdec_tpu.frame.structure import DM_CHROMA_IDX
    from vvdec_tpu.ops.pipeline import _itx_fn, _itx_lfnst_fn

    def fm(cu_, comp_):
        if comp_ == 0:
            return cu_.intra_dir[0]
        m = cu_.intra_dir[1]
        if m == DM_CHROMA_IDX:
            m = co_located_luma_mode_of(cs, cu_)
        if cs.sps.chroma_format_idc == 2 and m < 67:
            m = CHROMA422_MAP[m]
        return m

    bd = cs.sps.bit_depth
    resi = []
    for comp in range(3):
        if comp < cs.num_comp:
            w_c, h_c = cs.comp_size[comp]
        else:
            w_c, h_c = 1, 1
        resi.append(jnp.zeros((h_c + PB, w_c + PB), dtype=jnp.int32))

    groups: dict[tuple, list] = {}
    for tu in cs.tus:
        cu = cs.cus[tu.cu_idx]
        comps = []
        if tu.blocks[0] is not None and tu.cbf[0]:
            comps.append(0)
        if tu.blocks[1] is not None:
            comps += [c for c in (1, 2) if tu.cbf[c]]
        for comp in comps:
            x, y, w, h = tu.blocks[comp]
            lf_prm = None
            if cu.lfnst_idx:
                lf_prm = lfnst_params(cs, tu, cu, comp, fm)
            hor, ver = get_tr_types(cs, tu, cu, comp)
            qp = tu_qp(cs, tu, cu, comp)
            if cs.scaling_list is not None:
                smat = scaling_matrix_for(cs, tu, cu, comp)
                lt = (0 if cu.pred_mode == MODE_INTRA else 3) + comp \
                    if smat is not None else None
            else:
                smat, lt = None, None
            dq = bool(cs.sh_of(cu).dep_quant_used)
            if lf_prm is not None:
                mat, transpose, sb, zero = lf_prm
                key = (comp, w, h, hor, ver, lt, dq, sb, zero)
                groups.setdefault(key, []).append(
                    (x, y, qp, smat, mat[:, :zero], transpose))
            else:
                key = (comp, w, h, hor, ver, lt, dq)
                groups.setdefault(key, []).append((x, y, qp, smat))

    for key, items in groups.items():
        is_lfnst = len(key) == 9
        comp, w, h, hor, ver, lt, dep_quant = key[:7]
        n = len(items)
        n_pad = 1 << max(0, (n - 1)).bit_length()
        levels = np.zeros((n_pad, h, w), dtype=np.int32)
        ys = np.full(n_pad, cs.comp_size[comp][1], dtype=np.int32)
        xs = np.full(n_pad, cs.comp_size[comp][0], dtype=np.int32)
        qps = np.zeros(n_pad, dtype=np.int32)
        for i, it in enumerate(items):
            x, y = it[0], it[1]
            levels[i] = cs.coef[comp][y: y + h, x: x + w]
            ys[i], xs[i] = y, x
            qps[i] = it[2]
        if is_lfnst:
            sb, zero = key[7], key[8]
            kern = np.zeros((n_pad, 16 if sb == 4 else 48, zero),
                            dtype=np.int32)
            trans = np.zeros(n_pad, dtype=bool)
            for i, it in enumerate(items):
                kern[i] = it[4]
                trans[i] = it[5]
            fn = _itx_lfnst_fn(h, w, hor, ver, bd, dep_quant, sb, zero,
                               use_sl=lt is not None)
            args = (jnp.asarray(levels), jnp.asarray(qps),
                    jnp.asarray(kern), jnp.asarray(trans))
            out = fn(*args, jnp.asarray(items[0][3])) if lt is not None \
                else fn(*args)
        else:
            fn = _itx_fn(h, w, hor, ver, bd, dep_quant,
                         use_sl=lt is not None)
            if lt is not None:
                out = fn(jnp.asarray(levels), jnp.asarray(qps),
                         jnp.asarray(items[0][3]))
            else:
                out = fn(jnp.asarray(levels), jnp.asarray(qps))
        sc = _scatter_fn(resi[comp].shape[0], resi[comp].shape[1],
                         out.shape[1], out.shape[2], n_pad)
        resi[comp] = sc(resi[comp], out, jnp.asarray(ys), jnp.asarray(xs))
    return resi


def derive_frame_motion(cs) -> None:
    """Host motion-derivation pass: resolves merge/MMVD/AMVP/SMVD motion
    per inter CU in parse order, spans the 4x4 motion field and updates
    HMVP — no pixel work (DecCu::TaskDeriveCtuMotionInfo, DecCu.cpp:62).
    Only valid when the picture has no affine/GPM/CIIP/subblock/IBC CUs
    (plan_frame_device gates those first)."""
    from vvdec_tpu.frame.inter_np import MotionHist
    from vvdec_tpu.frame.recon_np import IntraReconstructor

    r = IntraReconstructor(cs)
    r._hist = MotionHist()
    r.derive_only = True
    if type(cs.tus) is list:
        for i, tu in enumerate(cs.tus):
            tu.order = i
    last_row = None
    seen = -1
    ctu_log2 = cs.sps.ctu_log2
    side = getattr(cs, "_mctx_side", None)
    for tu in cs.tus:
        cu = cs.cus[tu.cu_idx]
        if cu.idx == seen:
            continue
        seen = cu.idx
        row = (cu.y >> ctu_log2, cu.tile_idx)
        if row != last_row:
            r._hist.reset()
            last_row = row
        if cu.pred_mode != MODE_INTRA:
            r._derive_motion(cu)
            side = getattr(cs, "_mctx_side", side)
            if side is not None and cu.idx >= 0:
                side[cu.idx, 0] = cu.bcw_idx
                side[cu.idx, 1] = cu.imv


@functools.lru_cache(maxsize=None)
def _scatter_recon_fn(hp: int, wp: int, h: int, w: int, n: int, bd: int):
    """Jitted inter reconstruct scatter: recon[rect] = clip(pred + resi)
    per block (predAndReco for inter CUs, DecCu.cpp:378)."""
    pel_max = (1 << bd) - 1

    @jax.jit
    def run(recon, resi, blocks, ys, xs):
        def body(k, p):
            r = lax.dynamic_slice(resi, (ys[k], xs[k]), (h, w))
            out = jnp.clip(blocks[k] + r, 0, pel_max)
            return lax.dynamic_update_slice(p, out, (ys[k], xs[k]))

        return lax.fori_loop(0, n, body, recon)

    return run


def _mc_reconstruct_device(cs, recon, resi, get_ref):
    """Batched device MC for every inter CU + residual reconstruction,
    written into the padded device recon planes.  Reference planes come
    from get_ref(lst, ref_idx, comp) — device-resident DPB entries, so
    no pixel uploads happen here.  Grouping/arithmetic identical to
    ops/mc_device.mc_frame_device (bit-exact kernels: mc_batch_core /
    bi_combine_core / wp_combine_core)."""
    from vvdec_tpu.frame.dmvr_np import _wp_present
    from vvdec_tpu.frame.inter_np import BCW_INTERN, BCW_WEIGHTS, clip_mv
    from vvdec_tpu.hls.weight_table import resolve_wp
    from vvdec_tpu.ops.mc_device import (
        bi_combine_core, mc_batch_core, mc_coeff_rows, wp_combine_core)

    bd = cs.sps.bit_depth
    margin = cs.sps.ctu_size + 24
    groups: dict = {}
    for cu in cs.cus:
        if cu is None or cu.pred_mode == MODE_INTRA:
            continue
        groups.setdefault((cu.w, cu.h), []).append(cu)
    if not groups:
        return recon

    pads: dict = {}

    def padded(lst, ref_idx, comp, m):
        key = (lst, ref_idx, comp, m)
        ent = pads.get(key)
        if ent is None:
            # dedup identical planes across lists by object identity
            plane = get_ref(lst, ref_idx, comp)
            ent = pads.get((id(plane), m))
            if ent is None:
                ent = jnp.pad(plane, m, mode="edge")
                pads[(id(plane), m)] = ent
            pads[key] = ent
        return ent

    scatters = []  # (comp, x, y, pred[ch, cw])
    for (w, h), cus in groups.items():
        N = len(cus)
        wp_on = np.array([_wp_present(cs, cu) for cu in cus])
        uni = np.array([cu.inter_dir != 3 for cu in cus]) & ~wp_on
        parts = [[None] * cs.num_comp, [None] * cs.num_comp]
        for lst in (0, 1):
            rows = [i for i, cu in enumerate(cus)
                    if cu.inter_dir & (1 << lst)]
            if not rows:
                continue
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
                    pl = padded(lst, cu.ref_idx[lst], comp, mlist)
                    k = id(pl)
                    if k not in ridx_map:
                        ridx_map[k] = len(refs)
                        refs.append(pl)
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
        for comp in range(cs.num_comp):
            cw = w if comp == 0 else w // cs.sub_w
            ch = h if comp == 0 else h // cs.sub_h
            preds = [None] * N
            jmap = [None, None]
            for lst in (0, 1):
                if parts[lst][comp] is None:
                    continue
                rows, batch = parts[lst][comp]
                jmap[lst] = ({i: j for j, i in enumerate(rows)}, batch)
                for j, i in enumerate(rows):
                    if uni[i]:
                        preds[i] = batch[j]
            bi_rows = [i for i in range(N) if not uni[i] and not wp_on[i]]
            if bi_rows:
                j0, b0 = jmap[0]
                j1, b1 = jmap[1]
                a = jnp.stack([b0[j0[i]] for i in bi_rows])
                b = jnp.stack([b1[j1[i]] for i in bi_rows])
                w1 = np.array(
                    [4 if cus[i].bcw_idx == 0
                     else BCW_WEIGHTS[BCW_INTERN[cus[i].bcw_idx]]
                     for i in bi_rows], dtype=np.int32)
                comb = bi_combine_core(cw, ch, bd)(a, b, jnp.asarray(w1))
                for j, i in enumerate(bi_rows):
                    preds[i] = comb[j]
            wp_rows = [i for i in range(N) if wp_on[i]]
            if wp_rows:
                zeros = jnp.zeros((ch, cw), dtype=jnp.int32)
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
                comb = wp_combine_core(cw, ch, bd)(
                    jnp.stack(aL), jnp.stack(bL),
                    jnp.asarray(w0a), jnp.asarray(o0a),
                    jnp.asarray(w1a), jnp.asarray(o1a),
                    jnp.asarray(dna), jnp.asarray(bia))
                for j, i in enumerate(wp_rows):
                    preds[i] = comb[j]
            for i, cu in enumerate(cus):
                bx = cu.x if comp == 0 else cu.cx
                by = cu.y if comp == 0 else cu.cy
                scatters.append((comp, bx, by, preds[i]))

    # scatter reconstruct per (comp, block shape) batch
    by_shape: dict = {}
    for comp, bx, by, pred in scatters:
        by_shape.setdefault((comp, pred.shape), []).append((bx, by, pred))
    for (comp, shape), items in by_shape.items():
        n = len(items)
        n_pad = 1 << max(0, (n - 1)).bit_length()
        blocks = jnp.stack([p for _, _, p in items])
        if n_pad != n:
            blocks = jnp.pad(blocks, ((0, n_pad - n), (0, 0), (0, 0)))
        w_c, h_c = cs.comp_size[comp]
        ys = np.full(n_pad, h_c, dtype=np.int32)
        xs = np.full(n_pad, w_c, dtype=np.int32)
        for k, (bx, by, _) in enumerate(items):
            ys[k], xs[k] = by, bx
        fn = _scatter_recon_fn(recon[comp].shape[0], recon[comp].shape[1],
                               shape[0], shape[1], n_pad, bd)
        recon[comp] = fn(recon[comp], resi[comp], blocks,
                         jnp.asarray(ys), jnp.asarray(xs))
    return recon


def plan_frame_device(cs):
    """(intra descriptor tensor, None) when this picture can run the
    full device pipeline, else (None, reason) for the census.  For inter
    pictures this runs the host motion-derivation pass (needed both for
    the final DMVR/BDOF eligibility decision and, when eligible, as the
    device MC stage's input)."""
    from vvdec_tpu.ops.device_pipeline import device_filter_reject_reason

    reason = device_filter_reject_reason(cs)
    if reason is not None:
        return None, f"filter_{reason}"
    if getattr(cs, "per_slice_rpl", False):
        return None, "per_slice_rpl"
    desc, reason = build_intra_descriptors(cs)
    if reason is not None:
        return None, reason
    if any(cu.pred_mode != MODE_INTRA for cu in cs.cus):
        from vvdec_tpu.ops.mc_device import _cu_mc_eligible
        derive_frame_motion(cs)
        for cu in cs.cus:
            if cu.pred_mode == MODE_INTRA:
                continue
            if not _cu_mc_eligible(cs, cu):
                # aborted derive pass: drop the per-picture motion ctx so
                # the host fallback rebuilds it with its own HMVP buffers
                if hasattr(cs, "_mctx"):
                    del cs._mctx
                return None, "mc_tool"
    return desc, None


def reconstruct_frame_device(cs, desc, get_ref=None):
    """Run the full device pipeline for one (eligible) picture; returns
    the PendingFrame with device-resident output planes + the async
    packed readback (ops/device_pipeline.PendingFrame).  get_ref(lst,
    ref_idx, comp) supplies device-resident DPB reference planes for
    inter pictures."""
    from vvdec_tpu.ops.device_pipeline import filter_frame_device

    bd = cs.sps.bit_depth
    resi = itx_residual_device(cs)
    recon = [jnp.zeros_like(resi[comp]) for comp in range(3)]
    if get_ref is not None \
            and any(cu.pred_mode != MODE_INTRA for cu in cs.cus):
        recon = _mc_reconstruct_device(cs, recon, resi, get_ref)
    recon = run_intra_scan(recon, resi, desc, scan_key(cs))
    planes = []
    for comp in range(cs.num_comp):
        w_c, h_c = cs.comp_size[comp]
        planes.append(recon[comp][:h_c, :w_c])
    return filter_frame_device(cs, planes)
