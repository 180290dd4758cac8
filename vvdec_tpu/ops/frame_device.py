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


def plan_frame_device(cs):
    """(intra descriptor tensor, None) when this picture can run the
    full device pipeline, else (None, reason) for the census."""
    from vvdec_tpu.ops.device_pipeline import device_filter_reject_reason

    reason = device_filter_reject_reason(cs)
    if reason is not None:
        return None, f"filter_{reason}"
    return build_intra_descriptors(cs)


def reconstruct_frame_device(cs, desc):
    """Run the full device pipeline for one (eligible) picture; returns
    the PendingFrame with device-resident output planes + the async
    packed readback (ops/device_pipeline.PendingFrame)."""
    from vvdec_tpu.ops.device_pipeline import filter_frame_device

    bd = cs.sps.bit_depth
    resi = itx_residual_device(cs)
    planes_pad = []
    for comp in range(3):
        planes_pad.append(jnp.zeros_like(resi[comp]))
    planes_pad = run_intra_scan(planes_pad, resi, desc, bd)
    planes = []
    for comp in range(cs.num_comp):
        w_c, h_c = cs.comp_size[comp]
        planes.append(planes_pad[comp][:h_c, :w_c])
    return filter_frame_device(cs, planes)
