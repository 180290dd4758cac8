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
def _extract_fn(h: int, w: int, n: int):
    """Batch-extract n (h, w) tiles from a device-resident int16
    coefficient plane (the alternative — host-built per-group level
    arrays — costs one ~25 ms tunnel upload per group)."""

    @jax.jit
    def run(plane, ys, xs):
        out = jnp.zeros((n, h, w), jnp.int32)

        def body(k, o):
            t = lax.dynamic_slice(plane, (ys[k], xs[k]), (h, w))
            return lax.dynamic_update_slice(
                o, t.astype(jnp.int32)[None], (k, 0, 0))

        # explicit slice loop: a vmapped dynamic_slice becomes a gather,
        # which XLA:TPU may lower catastrophically on this operand
        return lax.fori_loop(0, n, body, out)

    return run


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
    coefd = []
    for comp in range(3):
        if comp < cs.num_comp:
            w_c, h_c = cs.comp_size[comp]
        else:
            w_c, h_c = 1, 1
        resi.append(jnp.zeros((h_c + PB, w_c + PB), dtype=jnp.int32))
        if comp < cs.num_comp:
            # ONE upload per plane, as int16 — parsed levels are within
            # +-2^15 (the parser's coefficient clip), and halving the
            # bytes halves the dominant per-frame transfer on a
            # link-bound chip; _extract_fn widens to int32 on device
            coefd.append(jnp.asarray(cs.coef[comp].astype(np.int16)))
        else:
            coefd.append(None)

    groups: dict[tuple, list] = {}
    jccr_ops: dict[tuple, list] = {}
    for tu in cs.tus:
        cu = cs.cus[tu.cu_idx]
        comps = []
        if tu.blocks[0] is not None and tu.cbf[0]:
            comps.append(0)
        if tu.blocks[1] is not None:
            if tu.joint_cbcr:
                # joint Cb-Cr: one coded chroma plane (its QP rides the
                # JCbCr mapping table inside tu_qp); the other plane is
                # derived by the ICT post-pass below
                # (TrQuant::invTransformCbCr, TrQuant.cpp:108)
                coded = 1 if (tu.joint_cbcr >> 1) else 2
                comps.append(coded)
                x1, y1, w1, h1 = tu.blocks[coded]
                jccr_ops.setdefault((w1, h1, tu.joint_cbcr), []).append(
                    (x1, y1))
            else:
                comps += [c for c in (1, 2) if tu.cbf[c]]
        for comp in comps:
            x, y, w, h = tu.blocks[comp]
            if tu.mts_idx[comp] == MTS_SKIP:
                # transform-skip: dequant only (recon_np.ts_residual;
                # BDPCM is gated out by build_intra_descriptors)
                qp = tu_qp(cs, tu, cu, comp)
                groups.setdefault(("ts", comp, w, h), []).append(
                    (x, y, qp, None))
                continue
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
        if key[0] == "ts":
            from vvdec_tpu.ops.pipeline import _ts_fn

            comp, w, h = key[1], key[2], key[3]
            n = len(items)
            n_pad = 1 << max(0, (n - 1)).bit_length()
            ys = np.zeros(n_pad, dtype=np.int32)
            xs = np.zeros(n_pad, dtype=np.int32)
            qps = np.zeros(n_pad, dtype=np.int32)
            for i, it in enumerate(items):
                ys[i], xs[i] = it[1], it[0]
                qps[i] = it[2]
            levels = _extract_fn(h, w, n_pad)(
                coefd[comp], jnp.asarray(ys), jnp.asarray(xs))
            fn = _ts_fn(h, w, bd,
                        cs.sps.internal_minus_input_bit_depth)
            out = fn(levels, jnp.asarray(qps))
            ys[n:] = cs.comp_size[comp][1]
            xs[n:] = cs.comp_size[comp][0]
            sc = _scatter_fn(resi[comp].shape[0], resi[comp].shape[1],
                             h, w, n_pad)
            resi[comp] = sc(resi[comp], out, jnp.asarray(ys),
                            jnp.asarray(xs))
            continue
        is_lfnst = len(key) == 9
        comp, w, h, hor, ver, lt, dep_quant = key[:7]
        n = len(items)
        n_pad = 1 << max(0, (n - 1)).bit_length()
        ys = np.zeros(n_pad, dtype=np.int32)
        xs = np.zeros(n_pad, dtype=np.int32)
        qps = np.zeros(n_pad, dtype=np.int32)
        for i, it in enumerate(items):
            ys[i], xs[i] = it[1], it[0]
            qps[i] = it[2]
        levels = _extract_fn(h, w, n_pad)(
            coefd[comp], jnp.asarray(ys), jnp.asarray(xs))
        ys[n:] = cs.comp_size[comp][1]
        xs[n:] = cs.comp_size[comp][0]
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
    # joint Cb-Cr ICT: derive the uncoded chroma residual plane from the
    # coded one, batched per (shape, mode) (invTransformCbCr)
    if jccr_ops:
        neg = bool(cs.ph.joint_cbcr_sign)
        for (w, h, mode), items in jccr_ops.items():
            coded = 1 if (mode >> 1) else 2
            other = 3 - coded
            n = len(items)
            n_pad = 1 << max(0, (n - 1)).bit_length()
            ys = np.full(n_pad, cs.comp_size[other][1], dtype=np.int32)
            xs = np.full(n_pad, cs.comp_size[other][0], dtype=np.int32)
            for i, (x1, y1) in enumerate(items):
                ys[i], xs[i] = y1, x1
            fn = _jccr_fn(resi[other].shape[0], resi[other].shape[1],
                          h, w, n_pad, mode, neg)
            resi[other] = fn(resi[other], resi[coded], jnp.asarray(ys),
                             jnp.asarray(xs))
    return resi


@functools.lru_cache(maxsize=None)
def _jccr_fn(hp: int, wp: int, h: int, w: int, n: int, mode: int,
             neg: bool):
    """Jitted joint-CbCr derivation: dst[rect] = ICT(src[rect]) per
    block (mode 1/2: +-src >> 1; mode 3: +-src), rects disjoint."""

    @jax.jit
    def run(dst, src, ys, xs):
        def body(k, p):
            r = lax.dynamic_slice(src, (ys[k], xs[k]), (h, w))
            if mode == 3:
                v = -r if neg else r
            else:
                v = ((-r) >> 1) if neg else (r >> 1)
            return lax.dynamic_update_slice(p, v, (ys[k], xs[k]))

        return lax.fori_loop(0, n, body, dst)

    return run


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


class _SubBlk:
    """Duck-typed CU fragment for subblock MC expansion (SbTMVP 8x8)."""

    __slots__ = ("x", "y", "w", "h", "cx", "cy", "cw", "ch", "inter_dir",
                 "mv", "ref_idx", "slice_idx", "bcw_idx", "alt_hpel")

    def __init__(self, **kw):
        self.bcw_idx = 0
        self.alt_hpel = False
        for k, v in kw.items():
            setattr(self, k, v)


@functools.lru_cache(maxsize=None)
def _prof_core(bd: int, hp: int, wp: int, n_refs: int):
    """Jitted PROF refinement over batched 4x4 affine subblocks: border
    extension from integer reference samples, gradients, dMv dot product
    (xPredAffineBlk PROF, InterPrediction.cpp:1045; host golden
    affine_np.affine_luma_4x4).  blk: [N,4,4] — 14-bit intermediate for
    prof/bi/wp items, final samples for plain-uni non-prof items (passed
    through)."""
    shift = max(2, 14 - bd)
    offs = 1 << 13
    offn = (1 << (shift - 1)) + offs
    lim = 1 << max(bd + 1, 13)
    pel_max = (1 << bd) - 1

    @jax.jit
    def apply(refs, yb, xb, ridx, blk, dmvh, dmvv, prof, inter):
        def one(r, y, x):
            return lax.dynamic_slice(refs, (r, y, x), (1, 6, 6))[0]

        win = jax.vmap(one)(ridx, yb, xb).astype(jnp.int32)
        ext = (win << shift) - offs
        ext = ext.at[:, 1:5, 1:5].set(blk)
        gx = (ext[:, 1:5, 2:6] >> 6) - (ext[:, 1:5, 0:4] >> 6)
        gy = (ext[:, 2:6, 1:5] >> 6) - (ext[:, 0:4, 1:5] >> 6)
        di = jnp.clip(dmvh * gx + dmvv * gy, -lim, lim - 1)
        pm = prof[:, None, None]
        out = blk + jnp.where(pm, di, 0)
        fin = jnp.clip((out + offn) >> shift, 0, pel_max)
        return jnp.where(inter[:, None, None], out,
                         jnp.where(pm, fin, blk))

    return apply


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
    from vvdec_tpu.frame.dmvr_np import (_wp_present, bdof_condition,
                                         dmvr_condition)
    from vvdec_tpu.frame.inter_np import BCW_INTERN, BCW_WEIGHTS, clip_mv
    from vvdec_tpu.hls.weight_table import resolve_wp
    from vvdec_tpu.ops.mc_device import (
        bi_combine_core, mc_batch_core, mc_coeff_rows, wp_combine_core)

    bd = cs.sps.bit_depth
    margin = cs.sps.ctu_size + 24
    groups: dict = {}
    geo_groups: dict = {}
    dmvr_groups: dict = {}
    bdof_groups: dict = {}
    aff_cus: list = []
    for cu in cs.cus:
        if cu is None or cu.pred_mode == MODE_INTRA:
            continue
        if cu.geo_flag:
            geo_groups.setdefault((cu.w, cu.h), []).append(cu)
            continue
        if cu.merge_type == 1:
            # SbTMVP: regular MC per 8x8 subblock off the spanned motion
            # field (xSubPuMC, InterPrediction.cpp:438) — expand into
            # duck-typed 8x8 blocks for the regular batches
            for by in range(0, cu.h, 8):
                for bx in range(0, cu.w, 8):
                    y4, x4 = (cu.y + by) >> 2, (cu.x + bx) >> 2
                    r0 = int(cs.mi_ref[y4, x4, 0])
                    r1 = int(cs.mi_ref[y4, x4, 1])
                    blk = _SubBlk(
                        x=cu.x + bx, y=cu.y + by, w=8, h=8,
                        cx=(cu.x + bx) // cs.sub_w,
                        cy=(cu.y + by) // cs.sub_h,
                        cw=8 // cs.sub_w, ch=8 // cs.sub_h,
                        inter_dir=(1 if r0 >= 0 else 0)
                        + (2 if r1 >= 0 else 0),
                        mv=[[int(cs.mi_mv[y4, x4, 0, 0]),
                             int(cs.mi_mv[y4, x4, 0, 1])],
                            [int(cs.mi_mv[y4, x4, 1, 0]),
                             int(cs.mi_mv[y4, x4, 1, 1])]],
                        ref_idx=[r0, r1], slice_idx=cu.slice_idx)
                    groups.setdefault((8, 8), []).append(blk)
            continue
        if cu.affine_flag:
            aff_cus.append(cu)
            continue
        # DMVR / standalone BDOF run in the dedicated refinement stage
        # (same dispatch split as the host recon driver,
        # recon_np.py:1619-1636; scaled refs are frame-rejected by
        # plan_frame_device before this point)
        cs_bio = bdof_condition(cs, cu)
        if dmvr_condition(cs, cu):
            dmvr_groups.setdefault((cu.w, cu.h), []).append((cu, cs_bio))
            continue
        if cs_bio:
            bdof_groups.setdefault((cu.w, cu.h), []).append(cu)
            continue
        groups.setdefault((cu.w, cu.h), []).append(cu)
    if not groups and not geo_groups and not aff_cus and not dmvr_groups \
            and not bdof_groups:
        return recon

    pads: dict = {}

    def padded(lst, ref_idx, comp, m):
        key = (lst, ref_idx, comp, m)
        ent = pads.get(key)
        if ent is None:
            # dedup identical planes across lists by object identity;
            # the keyed plane object must be KEPT ALIVE while the cache
            # exists — id() of a freed temporary (e.g. a fresh
            # jax.device_put result per get_ref call) can be reused by a
            # different plane, aliasing two references
            plane = get_ref(lst, ref_idx, comp)
            ent = pads.get((id(plane), m))
            if ent is None:
                ent = (jnp.pad(plane, m, mode="edge"), plane)
                pads[(id(plane), m)] = ent
            pads[key] = ent
        return ent[0]

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
                    [4 if (cus[i].bcw_idx == 0
                           or getattr(cus[i], "ciip_flag", False))
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
                # CIIP blended components: store the RAW inter pred (no
                # residual) — the intra-scan CIIP unit blends planar in,
                # adds the residual and clips at this CU's parse position
                raw = getattr(cu, "ciip_flag", False) and (
                    comp == 0 or (cs.num_comp > 1 and cu.cw > 2))
                scatters.append((comp, bx, by, preds[i], raw))

    # ---- GPM: two 14-bit uni parts blended with the geometric mask ----
    # (motionCompensationGeo, InterPrediction.cpp:1461; weights from
    # geo_np.geo_weight_block, uploaded per CU)
    from vvdec_tpu.frame.geo_np import geo_weight_block
    from vvdec_tpu.ops.mc_device import mc_batch_core as _mcb
    for (w, h), cus in geo_groups.items():
        N = len(cus)
        part_preds = [[None] * cs.num_comp, [None] * cs.num_comp]
        for k in (0, 1):
            for comp in range(cs.num_comp):
                sub = (cs.sub_w, cs.sub_h) if comp else (1, 1)
                taps = 8 if comp == 0 else 4
                half = taps // 2 - 1
                fxb = 4 + (cs.sub_w - 1) if comp else 4
                fyb = 4 + (cs.sub_h - 1) if comp else 4
                mlist = margin // sub[1]
                refs, ridx_map = [], {}
                y0 = np.zeros(N, np.int32)
                x0 = np.zeros(N, np.int32)
                ridx = np.zeros(N, np.int32)
                fx = np.zeros(N, np.int32)
                fy = np.zeros(N, np.int32)
                inter = np.ones(N, bool)   # always 14-bit intermediate
                for j, cu in enumerate(cus):
                    lst, ref, mv = cu._geo_parts[k]
                    mvc = clip_mv(mv, cu.x, cu.y, cs, size=(cu.w, cu.h))
                    pl = padded(lst, ref, comp, mlist)
                    ky = id(pl)
                    if ky not in ridx_map:
                        ridx_map[ky] = len(refs)
                        refs.append(pl)
                    ridx[j] = ridx_map[ky]
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
                cfx = mc_coeff_rows(fx, min(comp, 1))
                cfy = mc_coeff_rows(fy, min(comp, 1))
                rstack = jnp.stack(refs)
                cw = w if comp == 0 else w // cs.sub_w
                ch = h if comp == 0 else h // cs.sub_h
                fn = _mcb(cw, ch, taps, bd, int(rstack.shape[1]),
                          int(rstack.shape[2]), len(refs))
                part_preds[k][comp] = fn(
                    rstack, jnp.asarray(y0), jnp.asarray(x0),
                    jnp.asarray(ridx), jnp.asarray(cfy),
                    jnp.asarray(cfx), jnp.asarray(inter))
        shift = max(2, 14 - bd) + 3
        offset = (1 << (shift - 1)) + ((1 << 13) << 3)
        pel_max = (1 << bd) - 1
        for comp in range(cs.num_comp):
            cw = w if comp == 0 else w // cs.sub_w
            ch = h if comp == 0 else h // cs.sub_h
            sx = (cs.sub_w - 1) if comp else 0
            sy = (cs.sub_h - 1) if comp else 0
            wgt = jnp.asarray(np.stack(
                [geo_weight_block(cu.geo_split_dir, cw, ch, sx, sy)
                 .astype(np.int32) for cu in cus]))
            blend = jnp.clip(
                (wgt * part_preds[0][comp]
                 + (8 - wgt) * part_preds[1][comp] + offset) >> shift,
                0, pel_max)
            for j, cu in enumerate(cus):
                bx = cu.x if comp == 0 else cu.cx
                by = cu.y if comp == 0 else cu.cy
                scatters.append((comp, bx, by, blend[j], False))

    # ---- affine: per-4x4 subblock MC with PROF refinement ----
    # (xPredAffineBlk, InterPrediction.cpp:934; host golden
    # affine_np.affine_pred — 6-tap luma rows ride the 8-wide table)
    if aff_cus:
        from vvdec_tpu.frame.affine_np import (
            _deltas, prof_dmv_grid, round_affine, spread_over_limit)
        from vvdec_tpu.frame.inter_np import LUMA_IF_4X4
        from vvdec_tpu.hls.weight_table import resolve_wp as _rwp
        from vvdec_tpu.ops.mc_device import (
            bi_combine_core as _bic, mc_batch_core as _mcb2,
            wp_combine_core as _wpc)

        items = []    # luma 4x4: (cu, i_cu, bx, by)
        citems = []   # chroma 4x4 (chroma coords): (cu, i_cu, bx, by, mvs)
        cu_meta = []  # per cu: (wp, prof[2], dmv[2])
        for cu in aff_cus:
            wp_on = _wp_present(cs, cu) \
                and not (cu.inter_dir == 3 and cu.bcw_idx != 0)
            profs = [False, False]
            dmvs = [None, None]
            for lst in (0, 1):
                if not (cu.inter_dir & (1 << lst)):
                    continue
                lt, rt, lb = [tuple(v) for v in cu.cpmv[lst]]
                is6 = cu.affine_type == 1
                dhx, dhy, dvx, dvy = _deltas(lt, rt, lb, cu.w, cu.h, is6)
                spread = spread_over_limit(dhx, dhy, dvx, dvy,
                                           cu.inter_dir)
                prof = (cs.sps.prof_enabled and not cs.ph.prof_disabled
                        and not spread
                        and not (lt == rt if not is6
                                 else (lt == rt and lt == lb)))
                profs[lst] = prof
                if prof:
                    dmvs[lst] = prof_dmv_grid(lt, rt, lb, cu.w, cu.h, is6)
            ic = len(cu_meta)
            cu_meta.append((wp_on, profs, dmvs))
            for r in range(cu.h >> 2):
                for c in range(cu.w >> 2):
                    items.append((cu, ic, cu.x + c * 4, cu.y + r * 4))
            if cs.num_comp > 1:
                y4a, x4a = cu.y >> 2, cu.x >> 2
                for r in range(cu.ch >> 2):
                    for c in range(cu.cw >> 2):
                        mvs = [None, None]
                        for lst in (0, 1):
                            if not (cu.inter_dir & (1 << lst)):
                                continue
                            if cs.sub_w == 2 and cs.sub_h == 2:
                                a = (int(cs.mi_mv[y4a + 2 * r,
                                                  x4a + 2 * c, lst, 0]),
                                     int(cs.mi_mv[y4a + 2 * r,
                                                  x4a + 2 * c, lst, 1]))
                                b = (int(cs.mi_mv[y4a + 2 * r + 1,
                                                  x4a + 2 * c + 1,
                                                  lst, 0]),
                                     int(cs.mi_mv[y4a + 2 * r + 1,
                                                  x4a + 2 * c + 1,
                                                  lst, 1]))
                                mvs[lst] = round_affine(a[0] + b[0],
                                                        a[1] + b[1], 1)
                            elif cs.sub_w == 2:
                                a = (int(cs.mi_mv[y4a + r, x4a + 2 * c,
                                                  lst, 0]),
                                     int(cs.mi_mv[y4a + r, x4a + 2 * c,
                                                  lst, 1]))
                                b = (int(cs.mi_mv[y4a + r,
                                                  x4a + 2 * c + 1,
                                                  lst, 0]),
                                     int(cs.mi_mv[y4a + r,
                                                  x4a + 2 * c + 1,
                                                  lst, 1]))
                                mvs[lst] = round_affine(a[0] + b[0],
                                                        a[1] + b[1], 1)
                            else:
                                mvs[lst] = (int(cs.mi_mv[y4a + r, x4a + c,
                                                         lst, 0]),
                                            int(cs.mi_mv[y4a + r, x4a + c,
                                                         lst, 1]))
                        citems.append((cu, ic, cu.cx + c * 4,
                                       cu.cy + r * 4, mvs))

        def _aff_batch(its, comp):
            """One list's MC for all affine subblocks of one component."""
            sub = (cs.sub_w, cs.sub_h) if comp else (1, 1)
            taps = 8 if comp == 0 else 4
            half = taps // 2 - 1
            fxb = 4 + (cs.sub_w - 1) if comp else 4
            fyb = 4 + (cs.sub_h - 1) if comp else 4
            mlist = margin // sub[1]
            out = [None, None]
            for lst in (0, 1):
                rows = [j for j, it in enumerate(its)
                        if it[0].inter_dir & (1 << lst)]
                if not rows:
                    continue
                n = len(rows)
                refs, ridx_map = [], {}
                y0 = np.zeros(n, np.int32)
                x0 = np.zeros(n, np.int32)
                yb = np.zeros(n, np.int32)
                xb = np.zeros(n, np.int32)
                ridx = np.zeros(n, np.int32)
                fx = np.zeros(n, np.int32)
                fy = np.zeros(n, np.int32)
                inter = np.zeros(n, bool)
                prof_f = np.zeros(n, bool)
                dmvh = np.zeros((n, 4, 4), np.int32)
                dmvv = np.zeros((n, 4, 4), np.int32)
                for j, i in enumerate(rows):
                    it = its[i]
                    cu, ic, bx, by = it[0], it[1], it[2], it[3]
                    wp_on, profs, dmvs = cu_meta[ic]
                    if comp == 0:
                        mv = (int(cs.mi_mv[by >> 2, bx >> 2, lst, 0]),
                              int(cs.mi_mv[by >> 2, bx >> 2, lst, 1]))
                        mvc = clip_mv(mv, cu.x, cu.y, cs)
                    else:
                        mvc = clip_mv(it[4][lst], cu.x, cu.y, cs)
                    pl = padded(lst, cu.ref_idx[lst], comp, mlist)
                    ky = id(pl)
                    if ky not in ridx_map:
                        ridx_map[ky] = len(refs)
                        refs.append(pl)
                    ridx[j] = ridx_map[ky]
                    ix, iy = mvc[0] >> fxb, mvc[1] >> fyb
                    f_x = mvc[0] & ((1 << fxb) - 1)
                    f_y = mvc[1] & ((1 << fyb) - 1)
                    if comp:
                        f_x <<= (5 - fxb)
                        f_y <<= (5 - fyb)
                    x0[j] = bx + ix - half + mlist
                    y0[j] = by + iy - half + mlist
                    if comp == 0:
                        xb[j] = bx + ix + (f_x >> 3) - 1 + mlist
                        yb[j] = by + iy + (f_y >> 3) - 1 + mlist
                        prof_f[j] = profs[lst]
                        if profs[lst]:
                            dmvh[j] = dmvs[lst][0]
                            dmvv[j] = dmvs[lst][1]
                    fx[j], fy[j] = f_x, f_y
                    inter[j] = (cu.inter_dir == 3 or wp_on
                                or (comp == 0 and profs[lst]))
                cfx = mc_coeff_rows(fx, min(comp, 1),
                                    luma_table=LUMA_IF_4X4
                                    if comp == 0 else None)
                cfy = mc_coeff_rows(fy, min(comp, 1),
                                    luma_table=LUMA_IF_4X4
                                    if comp == 0 else None)
                rstack = jnp.stack(refs)
                fn = _mcb2(4, 4, taps, bd, int(rstack.shape[1]),
                           int(rstack.shape[2]), len(refs))
                blk = fn(rstack, jnp.asarray(y0), jnp.asarray(x0),
                         jnp.asarray(ridx), jnp.asarray(cfy),
                         jnp.asarray(cfx), jnp.asarray(inter))
                if comp == 0:
                    # PROF + normalization of prof-uni blocks; the
                    # combine-needed flag keeps bi/wp blocks 14-bit
                    comb = np.array(
                        [its[i][0].inter_dir == 3 or cu_meta[its[i][1]][0]
                         for i in rows])
                    pf = _prof_core(bd, int(rstack.shape[1]),
                                    int(rstack.shape[2]), len(refs))
                    blk = pf(rstack, jnp.asarray(yb), jnp.asarray(xb),
                             jnp.asarray(ridx), blk, jnp.asarray(dmvh),
                             jnp.asarray(dmvv), jnp.asarray(prof_f),
                             jnp.asarray(comb))
                out[lst] = ({i: j for j, i in enumerate(rows)}, blk)
            return out

        for comp in range(cs.num_comp):
            its = items if comp == 0 else citems
            if not its:
                continue
            parts2 = _aff_batch(its, comp)
            N = len(its)
            preds = [None] * N
            bi_rows, wp_rows = [], []
            for i, it in enumerate(its):
                cu, ic = it[0], it[1]
                wp_on = cu_meta[ic][0]
                if wp_on:
                    wp_rows.append(i)
                elif cu.inter_dir == 3:
                    bi_rows.append(i)
                else:
                    lst = 0 if cu.inter_dir & 1 else 1
                    jm, blk = parts2[lst]
                    preds[i] = blk[jm[i]]
            if bi_rows:
                j0, b0 = parts2[0]
                j1, b1 = parts2[1]
                a = jnp.stack([b0[j0[i]] for i in bi_rows])
                b = jnp.stack([b1[j1[i]] for i in bi_rows])
                w1 = np.array(
                    [4 if its[i][0].bcw_idx == 0
                     else BCW_WEIGHTS[BCW_INTERN[its[i][0].bcw_idx]]
                     for i in bi_rows], dtype=np.int32)
                comb = _bic(4, 4, bd)(a, b, jnp.asarray(w1))
                for j, i in enumerate(bi_rows):
                    preds[i] = comb[j]
            if wp_rows:
                zeros = jnp.zeros((4, 4), dtype=jnp.int32)
                aL, bL = [], []
                w0a = np.zeros(len(wp_rows), np.int32)
                o0a = np.zeros(len(wp_rows), np.int32)
                w1a = np.zeros(len(wp_rows), np.int32)
                o1a = np.zeros(len(wp_rows), np.int32)
                dna = np.zeros(len(wp_rows), np.int32)
                bia = np.zeros(len(wp_rows), bool)
                for j, i in enumerate(wp_rows):
                    cu = its[i][0]
                    wt = cs.sh_of(cu).weight_table
                    bia[j] = cu.inter_dir == 3
                    lst = 0 if cu.inter_dir in (1, 3) else 1
                    wp0 = _rwp(wt, lst, cu.ref_idx[lst], bd,
                               cs.num_comp)[comp]
                    aL.append(parts2[lst][1][parts2[lst][0][i]])
                    w0a[j] = wp0["w"]
                    o0a[j] = wp0["o"]
                    dna[j] = wp0["denom"]
                    if bia[j]:
                        wp1 = _rwp(wt, 1, cu.ref_idx[1], bd,
                                   cs.num_comp)[comp]
                        bL.append(parts2[1][1][parts2[1][0][i]])
                        w1a[j] = wp1["w"]
                        o1a[j] = wp1["o"]
                    else:
                        bL.append(zeros)
                comb = _wpc(4, 4, bd)(
                    jnp.stack(aL), jnp.stack(bL), jnp.asarray(w0a),
                    jnp.asarray(o0a), jnp.asarray(w1a), jnp.asarray(o1a),
                    jnp.asarray(dna), jnp.asarray(bia))
                for j, i in enumerate(wp_rows):
                    preds[i] = comb[j]
            for i, it in enumerate(its):
                scatters.append((comp, it[2], it[3], preds[i], False))

    # ---- DMVR + BDOF: device-refined MC (ops/dmvr_device.py) ----
    if dmvr_groups or bdof_groups:
        from vvdec_tpu.ops.dmvr_device import (
            LazyDmvrFixups, run_bdof_groups, run_dmvr_groups)
        if bdof_groups:
            run_bdof_groups(cs, bdof_groups, padded, margin, scatters)
        if dmvr_groups:
            fix = LazyDmvrFixups()
            run_dmvr_groups(cs, dmvr_groups, padded, margin, scatters,
                            fix)
            # decoder.py applies these to the motion field after deblock
            # strength derivation (TaskFinishMotionInfo ordering); the
            # iteration resolves the tiny refined-MV readback lazily
            cs.dmvr_fixups = fix

    # scatter reconstruct per (comp, block shape, raw) batch
    by_shape: dict = {}
    for comp, bx, by, pred, raw in scatters:
        by_shape.setdefault((comp, pred.shape, raw), []) \
            .append((bx, by, pred))
    for (comp, shape, raw), items in by_shape.items():
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
        if raw:
            fn = _scatter_fn(recon[comp].shape[0], recon[comp].shape[1],
                             shape[0], shape[1], n_pad)
            recon[comp] = fn(recon[comp], blocks, jnp.asarray(ys),
                             jnp.asarray(xs))
        else:
            fn = _scatter_recon_fn(recon[comp].shape[0],
                                   recon[comp].shape[1],
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
    if _lmcs_on(cs) and any(cu.pred_mode != MODE_INTRA
                            for cu in cs.cus):
        # inter LMCS needs decode-order chroma scaling interleaved with
        # the MC stage (and forward-mapped luma preds); host fallback
        return None, "lmcs_inter"
    if any(cu.pred_mode != MODE_INTRA for cu in cs.cus):
        from vvdec_tpu.ops.mc_device import _cu_mc_eligible

        # parse-time global gates FIRST: rejecting before the motion
        # pass avoids deriving the whole frame's motion twice (the host
        # fallback re-derives with its own HMVP buffers)
        if cs.sps.ref_wraparound_enabled or cs.subpics:
            return None, "mc_tool"

        def _reject():
            # aborted derive pass: drop the per-picture motion ctx so
            # the host fallback rebuilds it with its own HMVP buffers
            if hasattr(cs, "_mctx"):
                del cs._mctx
            return None, "mc_tool"

        derive_frame_motion(cs)
        any_scaled = any(s is not None
                         for lst in cs.ref_scaled for s in lst)
        from vvdec_tpu.frame.dmvr_np import bdof_condition, dmvr_condition
        for cu in cs.cus:
            if cu.pred_mode == MODE_INTRA:
                continue
            if cu.geo_flag or cu.affine_flag or cu.merge_type == 1 \
                    or cu.ciip_flag:
                # GPM / affine(+PROF) / SbTMVP run in the dedicated
                # device subblock batches (wraparound/subpics were
                # rejected above; scaled refs stay out of scope)
                if any_scaled:
                    return _reject()
                continue
            if dmvr_condition(cs, cu) or bdof_condition(cs, cu):
                # device-refined MC (ops/dmvr_device.py); the scaled-ref
                # gather windows stay out of scope
                if any_scaled:
                    return _reject()
                continue
            if not _cu_mc_eligible(cs, cu):
                return _reject()
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
    lmcs = None
    if _lmcs_on(cs):
        from vvdec_tpu.frame.lmcs_np import Reshaper
        from vvdec_tpu.ops.intra_device import build_lmcs_params
        rs = Reshaper(cs.lmcs_info, bd,
                      bool(cs.ph.chroma_residual_scale))
        lmcs = build_lmcs_params(rs, cs)
    recon = run_intra_scan(recon, resi, desc, scan_key(cs), lmcs)
    if lmcs is not None:
        # the RSP stage: inverse-map luma back to the original domain
        # before the in-loop filters (Reshape::rspCtuBcw, Reshape.cpp:377)
        from vvdec_tpu.ops.intra_device import lmcs_inv_map
        recon = (_lmcs_inv_fn(bd)(recon[0], jnp.asarray(lmcs)),
                 recon[1], recon[2])
    planes = []
    for comp in range(cs.num_comp):
        w_c, h_c = cs.comp_size[comp]
        planes.append(recon[comp][:h_c, :w_c])
    return filter_frame_device(cs, planes)


def _lmcs_on(cs) -> bool:
    return bool(cs.ph.lmcs_enabled
                and getattr(cs, "lmcs_info", None) is not None
                and cs.shs and cs.shs[0].lmcs_enabled)


@functools.lru_cache(maxsize=None)
def _lmcs_inv_fn(bd: int):
    from vvdec_tpu.ops.intra_device import lmcs_inv_map

    return jax.jit(lambda plane, lm: lmcs_inv_map(plane, lm, bd))
