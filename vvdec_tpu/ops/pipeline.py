"""JAX device pipeline: batched reconstruction stages on TPU.

TPU-first design (SURVEY.md §7): the host CABAC stage emits whole-frame
coefficient planes and per-TU metadata; the device plane runs *batched* stage
kernels over all TUs of a frame grouped by shape:

  Stage 1  dequant + inverse transform   — two int32 matmuls per size class
           (bit-exact integer arithmetic; the MXU int8-split Pallas kernel is
           the planned fast path, this is the XLA reference)
  Stage 2  intra prediction + reconstruct — host for now (sequential TU
           dependency; device wavefront planned)
  Stage 3  deblocking                     — batched edge-cell kernels
           (deblock_frame_jax): strength derivation on host, the per-edge
           luma/chroma filters run as one gather/filter/scatter per
           direction over all active 4-line cells
  Stage 4  SAO                            — whole-frame device kernel
  Stage 5  ALF / CC-ALF                   — whole-frame device kernel

All functions are shape-specialized and cached, so per-frame work is pure
device execution after warmup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vvdec_tpu.frame.structure import CodingStructure, MODE_INTRA, MTS_SKIP
from vvdec_tpu.ops import rom
from vvdec_tpu.ops.tables import tr_matrix

MAX_LOG2_TR_RANGE = 15


def _use_pallas() -> bool:
    """Route the ITX stage through the Pallas kernel on real TPU backends
    (the XLA einsum path is the portable fallback and the CPU-test target)."""
    import os
    if os.environ.get("VVDEC_TPU_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("VVDEC_TPU_NO_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _itx_fn(h: int, w: int, tr_hor: str, tr_ver: str, bit_depth: int,
            dep_quant: bool, use_sl: bool = False):
    """Jitted batched dequant+ITX for one TU shape: (levels [N,h,w] int32,
    qp [N] int32[, smat [h,w] int32]) -> residual [N,h,w] int32.

    With use_sl the per-coefficient scaling-list matrix multiplies the QP
    scale and the right shift grows by LOG2_SCALING_LIST_NEUTRAL_VALUE
    (Quant.cpp:335-338)."""
    log2_w, log2_h = w.bit_length() - 1, h.bit_length() - 1
    transform_shift = MAX_LOG2_TR_RANGE - bit_depth - ((log2_w + log2_h) >> 1)
    needs_sqrt2 = ((log2_w + log2_h) & 1) == 1
    i_transform_shift = transform_shift + (-1 if needs_sqrt2 else 0)
    scales = jnp.asarray(rom.INV_QUANT_SCALES[1 if needs_sqrt2 else 0],
                         dtype=jnp.int32)
    tr_max = (1 << MAX_LOG2_TR_RANGE) - 1

    mv = jnp.asarray(tr_matrix(tr_ver, h), dtype=jnp.int32)
    mh = jnp.asarray(tr_matrix(tr_hor, w), dtype=jnp.int32)
    s1 = 7
    s2 = (6 + MAX_LOG2_TR_RANGE - 1) - bit_depth
    clip_min, clip_max = -(1 << MAX_LOG2_TR_RANGE), (1 << MAX_LOG2_TR_RANGE) - 1

    if not use_sl and w > 1 and h > 1 and _use_pallas():
        # fused Pallas kernel (MXU matmuls + VPU dequant)
        from vvdec_tpu.ops.pallas.itx import dequant_params, itx_batch_pallas

        @jax.jit
        def run_pallas(levels: jnp.ndarray, qp: jnp.ndarray,
                       smat=None) -> jnp.ndarray:
            scale, rshift, imax = dequant_params(
                jnp.asarray(qp), w, h, bit_depth, dep_quant)
            return itx_batch_pallas(levels, scale, rshift, imax, mv, mh,
                                    h=h, w=w, bit_depth=bit_depth)

        return run_pallas

    @jax.jit
    def run(levels: jnp.ndarray, qp: jnp.ndarray,
            smat: jnp.ndarray | None = None) -> jnp.ndarray:
        if dep_quant:
            qp_per = (qp + 1) // 6
            qp_rem = qp + 1 - 6 * qp_per
        else:
            qp_per, qp_rem = qp // 6, qp % 6
        right_shift = 6 + (1 if dep_quant else 0) - (i_transform_shift + qp_per)
        if use_sl:
            right_shift = right_shift + 4  # LOG2_SCALING_LIST_NEUTRAL_VALUE
        scale = scales[qp_rem]
        target_bd = jnp.minimum(MAX_LOG2_TR_RANGE + 1, 64 + right_shift - 7)
        input_max = (1 << (target_bd - 1)) - 1

        lv = levels
        clipped = jnp.clip(lv, -input_max[:, None, None] - 1,
                           input_max[:, None, None])
        prod = clipped * scale[:, None, None]
        if use_sl:
            prod = prod * smat[None, :, :]
        rs = right_shift[:, None, None]
        pos = (prod + (1 << jnp.maximum(rs - 1, 0))) >> jnp.maximum(rs, 0)
        neg = prod << jnp.maximum(-rs, 0)
        deq = jnp.where(rs > 0, pos, neg)
        deq = jnp.where(lv != 0,
                        jnp.clip(deq, -tr_max - 1, tr_max), 0)

        if w > 1 and h > 1:
            # pass 1 (vertical): tmp[n, x, y'] = sum_k coeff[n, k, x] * Mv[k, y']
            tmp = jnp.einsum("nkx,ky->nxy", deq, mv,
                             preferred_element_type=jnp.int32)
            tmp = jnp.clip((tmp + (1 << (s1 - 1))) >> s1, clip_min, clip_max)
            # pass 2 (horizontal): res[n, y', x'] = sum_k tmp[n, k, y'] * Mh[k, x']
            blk = jnp.einsum("nky,kx->nyx", tmp, mh,
                             preferred_element_type=jnp.int32)
            res = jnp.clip((blk + (1 << (s2 - 1))) >> s2, clip_min, clip_max)
            return res
        # 1-D transforms
        s = s2 + 1
        if w == 1:
            blk = jnp.einsum("nk,ky->ny", deq[:, :, 0], mv,
                             preferred_element_type=jnp.int32)
            res = jnp.clip((blk + (1 << (s - 1))) >> s, clip_min, clip_max)
            return res[:, :, None]
        blk = jnp.einsum("nk,kx->nx", deq[:, 0, :], mh,
                         preferred_element_type=jnp.int32)
        res = jnp.clip((blk + (1 << (s - 1))) >> s, clip_min, clip_max)
        return res[:, None, :]

    return run


@functools.lru_cache(maxsize=None)
@functools.lru_cache(maxsize=None)
def _ts_fn(h: int, w: int, bit_depth: int, imi: int):
    """Transform-skip dequant on device (no transform): parity with
    recon_np.dequant_block(ts=True) / Quant.cpp DeQuant."""
    scales = jnp.asarray(rom.INV_QUANT_SCALES[0], dtype=jnp.int32)

    @jax.jit
    def run(levels, qp):
        lv = levels.astype(jnp.int32)
        qp2 = jnp.maximum(qp, 4 + 6 * imi)[:, None, None]
        qp_per = qp2 // 6
        qp_rem = qp2 - 6 * qp_per
        right_shift = 6 - qp_per
        scale = jnp.sum(
            jnp.where(qp_rem == jnp.arange(6)[None, None, None, :],
                      scales, 0), axis=-1)
        target_bd = jnp.minimum(16, 57 + right_shift)
        input_max = (1 << (target_bd - 1)) - 1
        clipped = jnp.clip(lv, -input_max - 1, input_max)
        rs_p = jnp.clip(right_shift, 0, 31)
        deq_p = (clipped * scale
                 + (1 << jnp.clip(right_shift - 1, 0, 31))) >> rs_p
        deq_n = (clipped * scale) << jnp.clip(-right_shift, 0, 31)
        deq = jnp.where(right_shift > 0, deq_p, deq_n)
        return jnp.where(lv != 0, jnp.clip(deq, -32768, 32767), 0)

    return run


@functools.lru_cache(maxsize=None)
def _itx_lfnst_fn(h: int, w: int, tr_hor: str, tr_ver: str,
                  bit_depth: int, dep_quant: bool, sb: int, zero_out: int,
                  use_sl: bool = False):
    """Jitted batched dequant + inverse LFNST + ITX for one TU shape
    (TrQuant::xInvLfnst between dequant and the primary transform,
    TrQuant.cpp:201/:290): (levels [N,h,w], qp [N], kern [N,48|16,zo]
    int32, trans [N] bool[, smat]) -> residual [N,h,w] int32.  The
    16-coefficient scan gather is compile-time constant; the two output
    placements (normal/transposed) are dense selects."""
    log2_w, log2_h = w.bit_length() - 1, h.bit_length() - 1
    transform_shift = MAX_LOG2_TR_RANGE - bit_depth \
        - ((log2_w + log2_h) >> 1)
    needs_sqrt2 = ((log2_w + log2_h) & 1) == 1
    i_transform_shift = transform_shift + (-1 if needs_sqrt2 else 0)
    scales = jnp.asarray(rom.INV_QUANT_SCALES[1 if needs_sqrt2 else 0],
                         dtype=jnp.int32)
    tr_max = (1 << MAX_LOG2_TR_RANGE) - 1
    mv = jnp.asarray(tr_matrix(tr_ver, h), dtype=jnp.int32)
    mh = jnp.asarray(tr_matrix(tr_hor, w), dtype=jnp.int32)
    s1 = 7
    s2 = (6 + MAX_LOG2_TR_RANGE - 1) - bit_depth
    clip_min = -(1 << MAX_LOG2_TR_RANGE)
    clip_max = (1 << MAX_LOG2_TR_RANGE) - 1
    scan16 = tuple(int(v) for v in rom.scan_grouped(w, h)[:16])

    @jax.jit
    def run(levels, qp, kern, trans, smat=None):
        if dep_quant:
            qp_per = (qp + 1) // 6
            qp_rem = qp + 1 - 6 * qp_per
        else:
            qp_per, qp_rem = qp // 6, qp % 6
        right_shift = 6 + (1 if dep_quant else 0) \
            - (i_transform_shift + qp_per)
        if use_sl:
            right_shift = right_shift + 4
        scale = scales[qp_rem]
        target_bd = jnp.minimum(MAX_LOG2_TR_RANGE + 1,
                                64 + right_shift - 7)
        input_max = (1 << (target_bd - 1)) - 1
        clipped = jnp.clip(levels, -input_max[:, None, None] - 1,
                           input_max[:, None, None])
        prod = clipped * scale[:, None, None]
        if use_sl:
            prod = prod * smat[None, :, :]
        rs = right_shift[:, None, None]
        pos = (prod + (1 << jnp.maximum(rs - 1, 0))) >> jnp.maximum(rs, 0)
        neg = prod << jnp.maximum(-rs, 0)
        deq = jnp.where(rs > 0, pos, neg)
        deq = jnp.where(levels != 0,
                        jnp.clip(deq, -tr_max - 1, tr_max), 0)

        # ---- inverse LFNST on the first 16 scan coefficients ----
        n = deq.shape[0]
        flat = deq.reshape(n, -1)
        src = jnp.stack([flat[:, i] for i in scan16], axis=1)
        out = jnp.einsum("nij,nj->ni", kern, src[:, :zero_out],
                         preferred_element_type=jnp.int32)
        out = jnp.clip((out + 64) >> 7, -(1 << 15), (1 << 15) - 1)
        tsel = trans[:, None, None]
        if sb == 4:
            blk = out.reshape(n, 4, 4)
            patch = jnp.where(tsel, blk.transpose(0, 2, 1), blk)
            deq = deq.at[:, :4, :4].set(patch)
        else:
            top = out[:, :32].reshape(n, 4, 8)
            bot = out[:, 32:48].reshape(n, 4, 4)
            base = deq[:, :8, :8]
            norm = base.at[:, :4, :8].set(top).at[:, 4:8, :4].set(bot)
            tr8 = base.at[:, :8, :4].set(top.transpose(0, 2, 1)) \
                .at[:, :4, 4:8].set(bot.transpose(0, 2, 1))
            deq = deq.at[:, :8, :8].set(jnp.where(tsel, tr8, norm))

        tmp = jnp.einsum("nkx,ky->nxy", deq, mv,
                         preferred_element_type=jnp.int32)
        tmp = jnp.clip((tmp + (1 << (s1 - 1))) >> s1, clip_min, clip_max)
        blk = jnp.einsum("nky,kx->nyx", tmp, mh,
                         preferred_element_type=jnp.int32)
        return jnp.clip((blk + (1 << (s2 - 1))) >> s2, clip_min, clip_max)

    return run


def itx_frame_jax(cs: CodingStructure) -> list[np.ndarray]:
    """Run stage 1 (dequant + inverse transform) for a whole frame on device.

    Returns per-component residual planes (int32) positioned at TU locations.
    """
    from vvdec_tpu.frame.recon_np import get_tr_types

    def fm(cu_, comp_):
        from vvdec_tpu.frame.recon_np import (
            CHROMA422_MAP, co_located_luma_mode_of)
        from vvdec_tpu.frame.structure import DM_CHROMA_IDX
        if comp_ == 0:
            return cu_.intra_dir[0]
        m = cu_.intra_dir[1]
        if m == DM_CHROMA_IDX:
            m = co_located_luma_mode_of(cs, cu_)
        if cs.sps.chroma_format_idc == 2 and m < 67:
            m = CHROMA422_MAP[m]
        return m

    resi = [np.zeros((h, w), dtype=np.int32) for (w, h) in cs.comp_size]
    groups: dict[tuple, list] = {}
    for tu in cs.tus:
        cu = cs.cus[tu.cu_idx]
        comps = []
        if tu.blocks[0] is not None and tu.cbf[0]:
            comps.append(0)
        if tu.blocks[1] is not None:
            if tu.joint_cbcr:
                # joint Cb-Cr: only the coded plane runs the transform;
                # the other is derived during reconstruction
                comps.append(1 if (tu.joint_cbcr >> 1) else 2)
            else:
                comps += [c for c in (1, 2) if tu.cbf[c]]
        for comp in comps:
            x, y, w, h = tu.blocks[comp]
            if tu.mts_idx[comp] == MTS_SKIP:
                # transform skip / BDPCM: host dequant only (no matmul)
                from vvdec_tpu.frame.recon_np import ts_residual
                resi[comp][y: y + h, x: x + w] = ts_residual(cs, tu, cu, comp)
                continue
            lf_prm = None
            if cu.lfnst_idx:
                from vvdec_tpu.frame.recon_np import lfnst_params
                lf_prm = lfnst_params(cs, tu, cu, comp, fm)
            hor, ver = get_tr_types(cs, tu, cu, comp)
            from vvdec_tpu.frame.recon_np import tu_qp
            qp = tu_qp(cs, tu, cu, comp)
            if cs.scaling_list is not None:
                from vvdec_tpu.frame.recon_np import scaling_matrix_for
                smat = scaling_matrix_for(cs, tu, cu, comp)
                lt = (0 if cu.pred_mode == MODE_INTRA else 3) + comp \
                    if smat is not None else None
            else:
                smat, lt = None, None
            dq = bool(cs.sh_of(cu).dep_quant_used)
            if lf_prm is not None:
                mat, transpose, sb, zero = lf_prm
                key = (comp != 0, w, h, hor, ver, lt, dq, sb, zero)
                groups.setdefault(key, []).append(
                    (comp, x, y, qp, smat, mat[:, :zero], transpose))
            else:
                key = (comp != 0, w, h, hor, ver, lt, dq)
                groups.setdefault(key, []).append((comp, x, y, qp, smat))

    # launch every shape-group's device computation first (async dispatch),
    # then overlap the device->host readbacks — one blocking sync per frame
    # instead of one per group (the host<->device link is latency-bound)
    launched = []
    for key, items in groups.items():
        is_lfnst = len(key) == 9
        (is_chroma, w, h, hor, ver, lt, dep_quant) = key[:7]
        n = len(items)
        # bucket the batch dimension to powers of two so compiled shapes
        # are stable across frames (bounded number of XLA programs)
        n_pad = 1 << max(0, (n - 1)).bit_length()
        levels = np.zeros((n_pad, h, w), dtype=np.int32)
        for i, it in enumerate(items):
            comp, x, y = it[0], it[1], it[2]
            levels[i] = cs.coef[comp][y: y + h, x: x + w]
        qps = np.zeros(n_pad, dtype=np.int32)
        qps[:n] = [it[3] for it in items]
        if is_lfnst:
            sb, zero = key[7], key[8]
            kern = np.zeros((n_pad, 16 if sb == 4 else 48, zero),
                            dtype=np.int32)
            trans = np.zeros(n_pad, dtype=bool)
            for i, it in enumerate(items):
                kern[i] = it[5]
                trans[i] = it[6]
            fn = _itx_lfnst_fn(h, w, hor, ver, cs.sps.bit_depth,
                               dep_quant, sb, zero, use_sl=lt is not None)
            args = (jnp.asarray(levels), jnp.asarray(qps),
                    jnp.asarray(kern), jnp.asarray(trans))
            out = fn(*args, jnp.asarray(items[0][4])) if lt is not None \
                else fn(*args)
        else:
            fn = _itx_fn(h, w, hor, ver, cs.sps.bit_depth, dep_quant,
                         use_sl=lt is not None)
            if lt is not None:
                out = fn(jnp.asarray(levels), jnp.asarray(qps),
                         jnp.asarray(items[0][4]))
            else:
                out = fn(jnp.asarray(levels), jnp.asarray(qps))
        launched.append((items, n, out))
    for _, _, out in launched:
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
    for items, n, out in launched:
        host = np.asarray(out)
        for it, blk in zip(items, host[:n]):
            comp, x, y = it[0], it[1], it[2]
            bh, bw = blk.shape
            resi[comp][y: y + bh, x: x + bw] = blk
    return resi


def reconstruct_frame_jax(cs: CodingStructure) -> list[np.ndarray]:
    """Frame reconstruction with stage 1 on device, stages 2-3 on host."""
    from vvdec_tpu.frame.recon_np import IntraReconstructor

    resi = itx_frame_jax(cs)
    r = IntraReconstructor(cs, residual_planes=resi)
    planes = r.run()
    deblock_frame_jax(cs, planes)
    return planes


# ======================================================================
# Stage 4: SAO — whole-frame device kernel
# ======================================================================
@functools.lru_cache(maxsize=None)
def _sao_apply_core(h: int, w: int, bd: int):
    """Jitted whole-frame SAO: per-pixel edge classification for all four
    EO classes + band offset, parameter lookup via per-pixel CTU index
    (parity: SampleAdaptiveOffset::offsetBlock_core, vectorized).  All
    int32; bit-exact."""
    pel_max = (1 << bd) - 1
    band_shift = bd - 5

    def apply(src, typ, ctu_idx, tables, mask):
        c = src.astype(jnp.int32)
        pad = jnp.pad(c, 1, mode="edge")

        def sgn(a):
            return jnp.sign(a).astype(jnp.int32)

        n = [
            (pad[1:-1, :-2], pad[1:-1, 2:]),    # EO 0 deg
            (pad[:-2, 1:-1], pad[2:, 1:-1]),    # EO 90
            (pad[:-2, :-2], pad[2:, 2:]),       # EO 135
            (pad[:-2, 2:], pad[2:, :-2]),       # EO 45
        ]
        edges = [sgn(c - a) + sgn(c - b) + 2 for a, b in n]
        edge = edges[0]
        for t in range(1, 4):
            edge = jnp.where(typ == t, edges[t], edge)
        band = c >> band_shift
        idx = jnp.where(typ == 4, 5 + band, edge)
        off = tables[ctu_idx, idx]
        out = jnp.clip(c + off, 0, pel_max)
        return jnp.where(mask, out, c).astype(src.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _sao_apply_fn(h: int, w: int, bd: int):
    return jax.jit(_sao_apply_core(h, w, bd))


def sao_frame_jax(cs: CodingStructure, planes: list[np.ndarray]) -> None:
    """In-place SAO with the pixel work on device; parameter maps built on
    host (frame/sao_np.sao_prepare_maps)."""
    if not any(s_.sao_enabled_luma or s_.sao_enabled_chroma
               for s_ in cs.shs):
        return
    from vvdec_tpu.frame.sao_np import sao_prepare_maps
    bd = cs.sps.bit_depth
    maps = sao_prepare_maps(cs)
    for comp, (type_map, ctu_idx, tables, mask) in enumerate(maps):
        if not mask.any():
            continue
        fn = _sao_apply_fn(planes[comp].shape[0], planes[comp].shape[1], bd)
        planes[comp][:] = np.asarray(
            fn(planes[comp], type_map, ctu_idx, tables, mask))


# ======================================================================
# Stage 5: ALF + CC-ALF — whole-frame device kernels
# ======================================================================
_LUMA_TAPS = ((3, 0), (2, 1), (2, 0), (2, -1), (1, 2), (1, 1), (1, 0),
              (1, -1), (1, -2), (0, 3), (0, 2), (0, 1))
_CHROMA_TAPS = ((2, 0), (1, 1), (1, 0), (1, -1), (0, 2), (0, 1))


def _vb_row_tables(h: int, vb_ctu_h: int, vb_pos: int, chroma: bool):
    """Per-row clipped vertical tap distances + near-VB flag
    (frame/alf_np._vb_row_offsets, vectorized)."""
    from vvdec_tpu.frame.alf_np import _vb_row_offsets
    d = np.zeros((h, 4), dtype=np.int32)
    near = np.zeros(h, dtype=bool)
    for y in range(h):
        d1, d2, d3, nr = _vb_row_offsets(y, vb_ctu_h, vb_pos, chroma)
        d[y] = (0, d1, d2, d3)
        near[y] = nr
    return d, near


@functools.lru_cache(maxsize=None)
def _alf_diamond_core(h: int, w: int, bd: int, n_taps: int):
    """Jitted clipped-diamond ALF filter (7x7 luma with n_taps=12, 5x5
    chroma with n_taps=6): per-pixel coefficients/clips, per-row virtual
    boundary tap clamping, per-pixel sample clamp windows.  Bit-exact
    int32 (parity: AdaptiveLoopFilter::filterBlk)."""
    taps = _LUMA_TAPS[:n_taps] if n_taps == 12 else _CHROMA_TAPS[:n_taps]
    pel_max = (1 << bd) - 1

    def apply(src, co, cl, dmap, near, lo_x, lo_y, hi_x, hi_y, mask):
        # co/cl: [H, W, n_taps] per-pixel coefficients / clip bounds
        s = src.astype(jnp.int32)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        curr = s
        acc = jnp.zeros((h, w), dtype=jnp.int32)

        def at(ry, rx):
            ry = jnp.clip(ry, lo_y, hi_y)
            rx = jnp.clip(rx, lo_x, hi_x)
            return s[ry, rx]

        for k, (dy, dx) in enumerate(taps):
            dd = dmap[:, dy][:, None]
            a = at(ys + dd, xs + dx)
            b = at(ys - dd, xs - dx)
            ck = cl[:, :, k]
            diff = jnp.clip(a - curr, -ck, ck) + jnp.clip(b - curr, -ck, ck)
            acc = acc + co[:, :, k] * diff
        nr = near[:, None]
        out = jnp.where(nr, (acc + (1 << 9)) >> 10, (acc + 64) >> 7)
        out = jnp.clip(out + curr, 0, pel_max)
        return jnp.where(mask, out, s).astype(src.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _alf_diamond_fn(h: int, w: int, bd: int, n_taps: int):
    return jax.jit(_alf_diamond_core(h, w, bd, n_taps))


@functools.lru_cache(maxsize=None)
def _alf_diamond_dense_core(h: int, w: int, bd: int, n_taps: int,
                            vb_h: int, vb_pos: int, chroma: bool):
    """Dense clipped-diamond ALF for whole-frame bounds: every tap access
    is a static pad+slice (no gathers — gathers cost ~100 ms/frame on TPU
    at 480p, slices fuse into the elementwise chain).  The per-row virtual
    boundary tap clamping becomes compile-time row masks selecting between
    slice variants.  Bit-exact parity with _alf_diamond_core at
    lo=(0,0), hi=(w-1,h-1)."""
    taps = _LUMA_TAPS[:n_taps] if n_taps == 12 else _CHROMA_TAPS[:n_taps]
    pel_max = (1 << bd) - 1
    dmap, near = _vb_row_tables(h, vb_h, vb_pos, chroma)
    near_rows = near[:, None]

    def apply(src, co, cl, mask):
        s = src.astype(jnp.int32)
        pad = jnp.pad(s, 3, mode="edge")

        def sh(dy, dx):
            return pad[3 + dy: 3 + dy + h, 3 + dx: 3 + dx + w]

        acc = jnp.zeros((h, w), dtype=jnp.int32)
        for k, (dy, dx) in enumerate(taps):
            dcol = dmap[:, dy]
            a = sh(dy, dx)
            b = sh(-dy, -dx)
            for dv in sorted(set(dcol.tolist())):
                if dv == dy:
                    continue
                rows = jnp.asarray((dcol == dv)[:, None])
                a = jnp.where(rows, sh(dv, dx), a)
                b = jnp.where(rows, sh(-dv, -dx), b)
            ck = cl[:, :, k]
            diff = jnp.clip(a - s, -ck, ck) + jnp.clip(b - s, -ck, ck)
            acc = acc + co[:, :, k] * diff
        nr = jnp.asarray(near_rows)
        out = jnp.where(nr, (acc + (1 << 9)) >> 10, (acc + 64) >> 7)
        out = jnp.clip(out + s, 0, pel_max)
        return jnp.where(mask, out, s).astype(src.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _ccalf_core(hc: int, wc: int, bd: int, scale_x: int, scale_y: int):
    """Jitted CC-ALF correction from the pre-ALF luma
    (filterBlkCcAlf, AdaptiveLoopFilter.cpp:1348)."""
    pel_max = (1 << bd) - 1
    half = (1 << bd) >> 1

    def apply(luma, dst, coeff, off_rows, skip_rows, lo_x, lo_y, hi_x,
              hi_y, active):
        # coeff: [Hc, Wc, 7]; off_rows: [Hc, 3] (off1, off2, off3)
        sl = luma.astype(jnp.int32)
        ys = jnp.arange(hc)[:, None]
        xs = jnp.arange(wc)[None, :]
        ly = ys << scale_y
        lx = xs << scale_x

        def lat(ry, rx):
            ry = jnp.clip(ry, lo_y, hi_y)
            rx = jnp.clip(rx, lo_x, hi_x)
            return sl[ry, rx]

        off1 = off_rows[:, 0][:, None]
        off2 = off_rows[:, 1][:, None]
        off3 = off_rows[:, 2][:, None]
        curr = lat(ly, lx)
        acc = (coeff[:, :, 0] * (lat(ly + off2, lx) - curr)
               + coeff[:, :, 1] * (lat(ly, lx - 1) - curr)
               + coeff[:, :, 2] * (lat(ly, lx + 1) - curr)
               + coeff[:, :, 3] * (lat(ly + off1, lx - 1) - curr)
               + coeff[:, :, 4] * (lat(ly + off1, lx) - curr)
               + coeff[:, :, 5] * (lat(ly + off1, lx + 1) - curr)
               + coeff[:, :, 6] * (lat(ly + off3, lx) - curr))
        acc = (acc + 64) >> 7
        acc = jnp.clip(acc + half, 0, pel_max) - half
        d = dst.astype(jnp.int32)
        out = jnp.clip(acc + d, 0, pel_max)
        use = active & ~skip_rows[:, None]
        return jnp.where(use, out, d).astype(dst.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _ccalf_fn(hc: int, wc: int, bd: int, scale_x: int, scale_y: int):
    return jax.jit(_ccalf_core(hc, wc, bd, scale_x, scale_y))


def alf_frame_jax(cs: CodingStructure, planes: list[np.ndarray]
                  ) -> list[np.ndarray]:
    """Whole-frame ALF with the pixel work on device (m_alfBuf swap
    semantics); parameter maps built on host (alf_np.alf_prepare_maps)."""
    from vvdec_tpu.frame.alf_np import alf_prepare_maps
    bd = cs.sps.bit_depth
    maps = alf_prepare_maps(cs, planes, bd)
    if maps is None:
        return planes
    vb_luma_h, vb_luma_pos, vb_chma_h, vb_chma_pos = maps["vb"]
    out = [p.copy() for p in planes]

    if maps["any_luma"]:
        h, w = planes[0].shape
        cls4 = maps["cls"]
        tr4 = maps["tr"]
        # per-pixel coefficient/clip gather on host (cheap per 4x4)
        co4 = maps["banks_co"][maps["set_map"], tr4, cls4]   # [h4, w4, 13]
        cl4 = maps["banks_cl"][maps["set_map"], tr4, cls4]
        co = np.repeat(np.repeat(co4[:, :, :12], 4, 0), 4, 1)[:h, :w] \
            .astype(np.int32)
        cl = np.repeat(np.repeat(cl4[:, :, :12], 4, 0), 4, 1)[:h, :w] \
            .astype(np.int32)
        dmap, near = _vb_row_tables(h, vb_luma_h, vb_luma_pos, False)
        fn = _alf_diamond_fn(h, w, bd, 12)
        out[0] = np.asarray(fn(planes[0], co, cl, dmap, near,
                               maps["lo_x"], maps["lo_y"], maps["hi_x"],
                               maps["hi_y"], maps["mask_y"]))

    if cs.num_comp > 1 and (maps["any_chroma"] or maps["any_cc"]):
        hc, wc = planes[1].shape
        dmap_c, near_c = _vb_row_tables(hc, vb_chma_h, vb_chma_pos, True)
        for comp in (1, 2):
            if maps["any_chroma"] and maps["mask_c"][comp - 1].any():
                alt4 = maps["chroma_alt"][comp - 1]
                co4 = maps["chroma_co"][alt4]   # [hc4, wc4, 7]
                cl4 = maps["chroma_cl"][alt4]
                co = np.repeat(np.repeat(co4[:, :, :6], 4, 0),
                               4, 1)[:hc, :wc].astype(np.int32)
                cl = np.repeat(np.repeat(cl4[:, :, :6], 4, 0),
                               4, 1)[:hc, :wc].astype(np.int32)
                fn = _alf_diamond_fn(hc, wc, bd, 6)
                out[comp] = np.asarray(fn(
                    planes[comp], co, cl, dmap_c, near_c,
                    maps["lo_xc"], maps["lo_yc"], maps["hi_xc"],
                    maps["hi_yc"], maps["mask_c"][comp - 1]))
            if maps["any_cc"] and (maps["cc_idx"][comp - 1] != 0).any():
                coeff = maps["cc_banks"][maps["cc_idx"][comp - 1]] \
                    .astype(np.int32)
                scale_x, scale_y = cs.sub_w - 1, cs.sub_h - 1
                # luma-coord clamp windows gathered at each chroma pixel's
                # collocated luma position
                lyi = (np.arange(hc) << scale_y)[:, None]
                lxi = (np.arange(wc) << scale_x)[None, :]
                lo_x_g = maps["lo_x"][lyi, lxi]
                lo_y_g = maps["lo_y"][lyi, lxi]
                hi_x_g = maps["hi_x"][lyi, lxi]
                hi_y_g = maps["hi_y"][lyi, lxi]
                off_rows = np.zeros((hc, 3), dtype=np.int32)
                skip_rows = np.zeros(hc, dtype=bool)
                for y in range(hc):
                    ly = y << scale_y
                    pos = ly & (vb_luma_h - 1)
                    if scale_y == 0 and pos in (vb_luma_pos,
                                                vb_luma_pos + 1):
                        skip_rows[y] = True
                        continue
                    o1, o2, o3 = 1, -1, 2
                    if pos in (vb_luma_pos - 2, vb_luma_pos + 1):
                        o3 = o1
                    elif pos in (vb_luma_pos - 1, vb_luma_pos):
                        o1 = o2 = o3 = 0
                    off_rows[y] = (o1, o2, o3)
                fn = _ccalf_fn(hc, wc, bd, scale_x, scale_y)
                out[comp] = np.asarray(fn(
                    planes[0], out[comp], coeff, off_rows, skip_rows,
                    lo_x_g, lo_y_g, hi_x_g, hi_y_g,
                    maps["cc_idx"][comp - 1] != 0))
    return out


# ======================================================================
# Stage 3: deblocking — batched-cell device kernels
# ======================================================================
# VVC guarantees per-direction non-overlap of deblocking operations, so
# each direction's active 4-sample edge cells are processed as one batch:
# gather 4x16 windows, run the decision tree + all filter variants
# vectorized over cells, scatter the selected results back
# (parity: the cell kernels in native/cabac.c / LoopFilter.cpp).

_DB_TC = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 4, 4, 4, 4, 5,
    5, 5, 5, 7, 7, 8, 9, 10, 10, 11, 13, 14, 15, 17, 19, 21, 24, 25, 29, 33,
    36, 41, 45, 51, 57, 64, 71, 80, 89, 100, 112, 125, 141, 157, 177, 198,
    222, 250, 280, 314, 352, 395], dtype=np.int32)
_DB_BETA = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34, 36, 38, 40, 42,
    44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78,
    80, 82, 84, 86, 88], dtype=np.int32)
# long-filter blend coefficients per length class (3/5/7) x position
_DB_DB = np.array([[53, 32, 11, 0, 0, 0, 0],
                   [58, 45, 32, 19, 6, 0, 0],
                   [59, 50, 41, 32, 23, 14, 5]], dtype=np.int32)
_DB_TCC = np.array([[6, 4, 2, 0, 0, 0, 0],
                    [6, 5, 4, 3, 2, 1, 1],
                    [6, 5, 4, 3, 2, 1, 1]], dtype=np.int32)


def _db_round(a, s):
    return (a + (1 << (s - 1))) >> s


@functools.lru_cache(maxsize=None)
def _deblock_luma_cells_core(H: int, W: int, direction: int, bd: int,
                             ctu_size: int, n_pad: int):
    """Jitted batched luma edge-cell filter for one direction
    (xEdgeFilterLuma, reference LoopFilter.cpp:851-1070 — all active
    4-line cells run as one gather / filter / masked-scatter).

    cells: [N,2] (x, y) luma positions of the 4-line edge segments;
    params: [N,6] (bs, qp, max_fl_p, max_fl_q, tc_off, beta_off); entries
    beyond n_valid have bs == 0 and are dropped by the write mask."""
    pel_max = (1 << bd) - 1

    def apply(plane, cells, params, n_valid):
        N = n_pad
        p32 = plane.astype(jnp.int32)
        xs = cells[:, 0]
        ys = cells[:, 1]
        lines = jnp.arange(4)
        ks = jnp.arange(-8, 8)
        if direction == 0:
            ry = ys[:, None, None] + lines[None, :, None]
            rx = xs[:, None, None] + ks[None, None, :]
        else:
            ry = ys[:, None, None] + jnp.broadcast_to(
                ks[None, None, :], (N, 4, 16))
            rx = xs[:, None, None] + jnp.broadcast_to(
                lines[None, :, None], (N, 4, 16))
        ryc = jnp.clip(ry, 0, H - 1)
        rxc = jnp.clip(rx, 0, W - 1)
        win = p32[ryc, rxc]  # [N, 4, 16]; win[:, line, 8+k] = cget(line, k)

        def g(line, k):
            return win[:, line, 8 + k]

        bs = params[:, 0]
        qp = params[:, 1]
        mfp = params[:, 2]
        mfq = params[:, 3]
        tc_off = params[:, 4]
        beta_off = params[:, 5]
        sp_large = mfp > 3
        sq_large = mfq > 3
        if direction == 1:
            sp_large = sp_large & ((ys & (ctu_size - 1)) != 0)

        idx_tc = jnp.clip(qp + 2 * (bs - 1) + 2 * tc_off, 0, 65)
        idx_b = jnp.clip(qp + 2 * beta_off, 0, 63)
        tc_tab = jnp.asarray(_DB_TC)
        if bd >= 10:
            tc = tc_tab[idx_tc] << (bd - 10)
        else:
            tc = (tc_tab[idx_tc] + (1 << (9 - bd))) >> (10 - bd)
        beta = jnp.asarray(_DB_BETA)[idx_b] << (bd - 8)
        side_thresh = (beta + (beta >> 1)) >> 3
        thr_cut = tc * 10
        inactive = (beta == 0) & (tc == 0)

        def calc_dp(line, base):
            return jnp.abs(g(line, base - 3) - 2 * g(line, base - 2)
                           + g(line, base - 1))

        def calc_dq(line, base):
            return jnp.abs(g(line, base) - 2 * g(line, base + 1)
                           + g(line, base + 2))

        dp0, dq0 = calc_dp(0, 0), calc_dq(0, 0)
        dp3, dq3 = calc_dp(3, 0), calc_dq(3, 0)
        d0, d3 = dp0 + dq0, dp3 + dq3

        # large-side decision (use_strong with use_large)
        mfp_i = jnp.where(sp_large, mfp, 3)
        mfq_i = jnp.where(sq_large, mfq, 3)

        def use_strong_large(line, d2):
            m3, m4 = g(line, -1), g(line, 0)
            ok0 = (d2 < (beta >> 2)) & (jnp.abs(m3 - m4)
                                        < ((tc * 5 + 1) >> 1))
            m0, m7 = g(line, -4), g(line, 3)
            sp3 = jnp.abs(m0 - m3)
            sq3 = jnp.abs(m7 - m4)
            # P side
            idxp = jnp.clip(-mfp - 1, -8, 7)
            mp4 = win[jnp.arange(N), line, 8 + idxp]
            sp3_7 = sp3 + jnp.abs(g(line, -5) - g(line, -6) - g(line, -7)
                                  + mp4)
            sp3l = jnp.where(mfp == 7, sp3_7, sp3)
            sp3l = (sp3l + jnp.abs(m0 - mp4) + 1) >> 1
            sp3 = jnp.where(sp_large, sp3l, sp3)
            # Q side
            idxq = jnp.clip(mfq, -8, 7)
            m11 = win[jnp.arange(N), line, 8 + idxq]
            sq3_7 = sq3 + jnp.abs(g(line, 4) - g(line, 5) - g(line, 6)
                                  + m11)
            sq3l = jnp.where(mfq == 7, sq3_7, sq3)
            sq3l = (sq3l + jnp.abs(m11 - m7) + 1) >> 1
            sq3 = jnp.where(sq_large, sq3l, sq3)
            return ok0 & ((sp3 + sq3) < (beta * 3 >> 5)) \
                & (d2 < (beta >> 4)) \
                & (jnp.abs(m3 - m4) < ((tc * 5 + 1) >> 1))

        dp0l = jnp.where(sp_large, (dp0 + calc_dp(0, -3) + 1) >> 1, dp0)
        dq0l = jnp.where(sq_large, (dq0 + calc_dq(0, 3) + 1) >> 1, dq0)
        dp3l = jnp.where(sp_large, (dp3 + calc_dp(3, -3) + 1) >> 1, dp3)
        dq3l = jnp.where(sq_large, (dq3 + calc_dq(3, 3) + 1) >> 1, dq3)
        d0l, d3l = dp0l + dq0l, dp3l + dq3l
        sw_l = (sp_large | sq_large) & ((d0l + d3l) < beta) \
            & use_strong_large(0, 2 * d0l) & use_strong_large(3, 2 * d3l)

        # ---- long bilinear filter (per line, both sides up to 7) ----
        n_p = jnp.where(sp_large, mfp, 3)
        n_q = jnp.where(sq_large, mfq, 3)
        np_cls = jnp.clip((n_p - 3) >> 1, 0, 2)  # 3/5/7 -> 0/1/2
        nq_cls = jnp.clip((n_q - 3) >> 1, 0, 2)
        arangeN = jnp.arange(N)

        def side_val(line, pos, is_p):
            k = jnp.where(is_p, -1 - pos, pos)
            return win[arangeN[:, None], line,
                       8 + jnp.clip(k, -8, 7)]

        pos7 = jnp.arange(7)[None, :]
        pos8 = jnp.arange(8)[None, :]

        def long_filter_line(line):
            P8 = side_val(line, pos8, True)   # [N, 8]; P8[:, k] = P(k)
            Q8 = side_val(line, pos8, False)
            P, Q = P8[:, :7], Q8[:, :7]
            # endpoint reference: (P(n_p-1) + P(n_p) + 1) >> 1 — P(7) is
            # offset -8, inside the 16-wide window
            ref_p = (P8[arangeN, n_p - 1] + P8[arangeN, n_p] + 1) >> 1
            ref_q = (Q8[arangeN, n_q - 1] + Q8[arangeN, n_q] + 1) >> 1
            # middle reference, 5 variants
            rm_55 = (2 * (P[:, 0] + Q[:, 0] + P[:, 1] + Q[:, 1]
                          + P[:, 2] + Q[:, 2])
                     + P[:, 3] + Q[:, 3] + P[:, 4] + Q[:, 4] + 8) >> 4
            rm_77 = (2 * (P[:, 0] + Q[:, 0]) + P[:, 1] + Q[:, 1]
                     + P[:, 2] + Q[:, 2] + P[:, 3] + Q[:, 3]
                     + P[:, 4] + Q[:, 4] + P[:, 5] + Q[:, 5]
                     + P[:, 6] + Q[:, 6] + 8) >> 4
            rm_75 = (2 * (P[:, 0] + Q[:, 0] + P[:, 1] + Q[:, 1])
                     + P[:, 2] + Q[:, 2] + P[:, 3] + Q[:, 3]
                     + P[:, 4] + Q[:, 4] + P[:, 5] + Q[:, 5] + 8) >> 4
            # 7 & 3 with pl = larger side, ql = smaller side
            pl = jnp.where((n_q > n_p)[:, None], Q, P)
            ql = jnp.where((n_q > n_p)[:, None], P, Q)
            rm_73 = (2 * (pl[:, 0] + ql[:, 0]) + ql[:, 0]
                     + 2 * (ql[:, 1] + ql[:, 2]) + pl[:, 1] + ql[:, 1]
                     + pl[:, 2] + pl[:, 3] + pl[:, 4] + pl[:, 5]
                     + pl[:, 6] + 8) >> 4
            rm_53 = (P[:, 0] + Q[:, 0] + P[:, 1] + Q[:, 1] + P[:, 2]
                     + Q[:, 2] + P[:, 3] + Q[:, 3] + 4) >> 3
            n_l = jnp.maximum(n_p, n_q)
            n_s = jnp.minimum(n_p, n_q)
            ref_m = jnp.where(
                (n_p == n_q) & (n_p == 5), rm_55,
                jnp.where((n_p == n_q), rm_77,
                          jnp.where((n_l == 7) & (n_s == 5), rm_75,
                                    jnp.where((n_l == 7) & (n_s == 3),
                                              rm_73, rm_53))))
            dbp = jnp.asarray(_DB_DB)[np_cls]     # [N, 7]
            dbq = jnp.asarray(_DB_DB)[nq_cls]
            tcp = jnp.asarray(_DB_TCC)[np_cls]
            tcq = jnp.asarray(_DB_TCC)[nq_cls]
            cvp = (tc[:, None] * tcp) >> 1
            cvq = (tc[:, None] * tcq) >> 1
            valp = (ref_m[:, None] * dbp + ref_p[:, None] * (64 - dbp)
                    + 32) >> 6
            valq = (ref_m[:, None] * dbq + ref_q[:, None] * (64 - dbq)
                    + 32) >> 6
            newp = jnp.maximum(P - cvp, jnp.minimum(P + cvp, valp))
            newq = jnp.maximum(Q - cvq, jnp.minimum(Q + cvq, valq))
            usep = pos7 < n_p[:, None]
            useq = pos7 < n_q[:, None]
            return newp, newq, usep, useq

        # ---- regular decisions ----
        dp, dq, d = dp0 + dp3, dq0 + dq3, d0 + d3
        filt_pq = (mfp > 1) & (mfq > 1)
        filter_p = filt_pq & (dp < side_thresh)
        filter_q = filt_pq & (dq < side_thresh)

        def use_strong_small(line, d2):
            m3, m4 = g(line, -1), g(line, 0)
            ok0 = (d2 < (beta >> 2)) & (jnp.abs(m3 - m4)
                                        < ((tc * 5 + 1) >> 1))
            m0, m7 = g(line, -4), g(line, 3)
            return ok0 & ((jnp.abs(m0 - m3) + jnp.abs(m7 - m4))
                          < (beta >> 3))

        sw = (mfp > 2) & (mfq > 2) & use_strong_small(0, 2 * d0) \
            & use_strong_small(3, 2 * d3)

        # ---- per-line regular filters (strong + weak) ----
        def regular_line(line):
            m0, m1, m2 = g(line, -4), g(line, -3), g(line, -2)
            m3, m4 = g(line, -1), g(line, 0)
            m5, m6, m7 = g(line, 1), g(line, 2), g(line, 3)

            def c3(v, ref, t):
                return jnp.maximum(ref - t, jnp.minimum(ref + t, v))
            s_m1 = c3((2 * m0 + 3 * m1 + m2 + m3 + m4 + 4) >> 3, m1, tc)
            s_m2 = c3((m1 + m2 + m3 + m4 + 2) >> 2, m2, 2 * tc)
            s_m3 = c3((m1 + 2 * m2 + 2 * m3 + 2 * m4 + m5 + 4) >> 3, m3,
                      3 * tc)
            s_m4 = c3((m2 + 2 * m3 + 2 * m4 + 2 * m5 + m6 + 4) >> 3, m4,
                      3 * tc)
            s_m5 = c3((m3 + m4 + m5 + m6 + 2) >> 2, m5, 2 * tc)
            s_m6 = c3((m3 + m4 + m5 + 3 * m6 + 2 * m7 + 4) >> 3, m6, tc)

            delta = (9 * (m4 - m3) - 3 * (m5 - m2) + 8) >> 4
            wk_on = jnp.abs(delta) < thr_cut
            dcl = jnp.clip(delta, -tc, tc)
            tc2 = tc >> 1
            w_m3 = jnp.clip(m3 + dcl, 0, pel_max)
            w_m4 = jnp.clip(m4 - dcl, 0, pel_max)
            d1 = jnp.clip((((m1 + m3 + 1) >> 1) - m2 + dcl) >> 1, -tc2, tc2)
            w_m2 = jnp.clip(m2 + d1, 0, pel_max)
            d2_ = jnp.clip((((m6 + m4 + 1) >> 1) - m5 - dcl) >> 1, -tc2,
                           tc2)
            w_m5 = jnp.clip(m5 + d2_, 0, pel_max)
            # outputs at offsets -3..2: (value, written) per variant
            strong_vals = jnp.stack([s_m1, s_m2, s_m3, s_m4, s_m5, s_m6],
                                    axis=-1)
            weak_vals = jnp.stack(
                [m1, jnp.where(filter_p, w_m2, m2), w_m3, w_m4,
                 jnp.where(filter_q, w_m5, m5), m6], axis=-1)
            weak_write = jnp.stack(
                [jnp.zeros_like(wk_on), wk_on & filter_p, wk_on, wk_on,
                 wk_on & filter_q, jnp.zeros_like(wk_on)], axis=-1)
            vals = jnp.where(sw[:, None], strong_vals, weak_vals)
            write = jnp.where(sw[:, None],
                              jnp.ones_like(weak_write), weak_write)
            return vals, write

        # assemble final per-sample window updates [N, 4, 16]
        new_win = win
        wmask = jnp.zeros((N, 4, 16), dtype=bool)
        reg_ok = (~sw_l) & (d < beta)
        for line in range(4):
            lp, lq, up, uq = long_filter_line(line)
            rv, rw = regular_line(line)
            # long: offsets -1-pos (p) and +pos (q)
            for pos in range(7):
                kp = 8 + (-1 - pos)
                kq = 8 + pos
                sel_p = sw_l & up[:, pos]
                sel_q = sw_l & uq[:, pos]
                new_win = new_win.at[:, line, kp].set(
                    jnp.where(sel_p, lp[:, pos], new_win[:, line, kp]))
                new_win = new_win.at[:, line, kq].set(
                    jnp.where(sel_q, lq[:, pos], new_win[:, line, kq]))
                wmask = wmask.at[:, line, kp].set(
                    wmask[:, line, kp] | sel_p)
                wmask = wmask.at[:, line, kq].set(
                    wmask[:, line, kq] | sel_q)
            for j, k in enumerate(range(8 - 3, 8 + 3)):
                sel = reg_ok & rw[:, j]
                new_win = new_win.at[:, line, k].set(
                    jnp.where(sel, rv[:, j], new_win[:, line, k]))
                wmask = wmask.at[:, line, k].set(wmask[:, line, k] | sel)

        valid = (jnp.arange(N) < n_valid) & (bs > 0) & (~inactive)
        wmask = wmask & valid[:, None, None]
        # scatter back (per-direction writes are disjoint across cells)
        flat = p32.reshape(-1)
        idx = (ryc * W + rxc).reshape(-1)
        upd = jnp.where(wmask, new_win, win).reshape(-1)
        do = wmask.reshape(-1)
        flat = flat.at[jnp.where(do, idx, flat.shape[0])].set(
            upd, mode="drop")
        return flat.reshape(H, W).astype(plane.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _deblock_luma_cells_fn(H: int, W: int, direction: int, bd: int,
                           ctu_size: int, n_pad: int):
    return jax.jit(_deblock_luma_cells_core(H, W, direction, bd, ctu_size,
                                            n_pad))


@functools.lru_cache(maxsize=None)
def _deblock_chroma_cells_core(H: int, W: int, direction: int, bd: int,
                               loop_len: int, sub_shift: int, n_pad: int):
    """Jitted batched chroma edge-cell filter (xEdgeFilterChroma,
    reference LoopFilter.cpp:1072-1210; parity with the host C cell
    kernel mod_deblock_chroma).
    params: [N,6] (bs, qp, large, tc_off, beta_off, hor_ctb)."""
    pel_max = (1 << bd) - 1

    def apply(plane, cells, params, n_valid):
        N = n_pad
        p32 = plane.astype(jnp.int32)
        xs = cells[:, 0]
        ys = cells[:, 1]
        lines = jnp.arange(loop_len)
        ks = jnp.arange(-4, 4)
        if direction == 0:
            ry = ys[:, None, None] + jnp.broadcast_to(
                lines[None, :, None], (N, loop_len, 8))
            rx = xs[:, None, None] + jnp.broadcast_to(
                ks[None, None, :], (N, loop_len, 8))
        else:
            ry = ys[:, None, None] + jnp.broadcast_to(
                ks[None, None, :], (N, loop_len, 8))
            rx = xs[:, None, None] + jnp.broadcast_to(
                lines[None, :, None], (N, loop_len, 8))
        ryc = jnp.clip(ry, 0, H - 1)
        rxc = jnp.clip(rx, 0, W - 1)
        win = p32[ryc, rxc]  # [N, loop_len, 8]; win[:, l, 4+k] = cget(l, k)

        def g(line, k):
            return win[:, line, 4 + k]

        bs = params[:, 0]
        qp = params[:, 1]
        large = params[:, 2] != 0
        tc_off = params[:, 3]
        beta_off = params[:, 4]
        hor_ctb = params[:, 5] != 0

        idx_tc = jnp.clip(qp + 2 * (bs - 1) + 2 * tc_off, 0, 65)
        tc_tab = jnp.asarray(_DB_TC)
        if bd >= 10:
            tc = tc_tab[idx_tc] << (bd - 10)
        else:
            tc = (tc_tab[idx_tc] + (1 << (9 - bd))) >> (10 - bd)
        inactive = (tc == 0) & (~large)

        idx_b = jnp.clip(qp + 2 * beta_off, 0, 63)
        beta = jnp.asarray(_DB_BETA)[idx_b] << (bd - 8)
        line3 = 1 if sub_shift == 1 else 3

        def calc_dp(line):
            base = jnp.where(hor_ctb,
                             jnp.abs(g(line, -2) - 2 * g(line, -2)
                                     + g(line, -1)),
                             jnp.abs(g(line, -3) - 2 * g(line, -2)
                                     + g(line, -1)))
            return base

        def calc_dq(line):
            return jnp.abs(g(line, 0) - 2 * g(line, 1) + g(line, 2))

        def chroma_strong(line, d2):
            m3, m4 = g(line, -1), g(line, 0)
            ok0 = (d2 < (beta >> 2)) & (jnp.abs(m3 - m4)
                                        < ((tc * 5 + 1) >> 1))
            m0, m7 = g(line, -4), g(line, 3)
            m2 = g(line, -2)
            sp3 = jnp.where(hor_ctb, jnp.abs(m2 - m3), jnp.abs(m0 - m3))
            sq3 = jnp.abs(m7 - m4)
            return ok0 & ((sp3 + sq3) < (beta >> 3))

        d0 = calc_dp(0) + calc_dq(0)
        d3 = calc_dp(line3) + calc_dq(line3)
        sw = large & ((d0 + d3) < beta) & chroma_strong(0, 2 * d0) \
            & chroma_strong(line3, 2 * d3)

        new_win = win
        wmask = jnp.zeros_like(win, dtype=bool)
        for line in range(loop_len):
            m0, m1, m2 = g(line, -4), g(line, -3), g(line, -2)
            m3, m4 = g(line, -1), g(line, 0)
            m5, m6, m7 = g(line, 1), g(line, 2), g(line, 3)

            def c3(v, ref):
                return jnp.maximum(ref - tc, jnp.minimum(ref + tc, v))
            # strong, hor_ctb variant (writes -1..2)
            h_m3 = c3((3 * m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3)
            h_m4 = c3((2 * m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4)
            h_m5 = c3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5)
            h_m6 = c3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6)
            # strong, full variant (writes -3..2)
            f_m1 = c3((3 * m0 + 2 * m1 + m2 + m3 + m4 + 4) >> 3, m1)
            f_m2 = c3((2 * m0 + m1 + 2 * m2 + m3 + m4 + m5 + 4) >> 3, m2)
            f_m3 = c3((m0 + m1 + m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3)
            f_m4 = c3((m1 + m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4)
            f_m5 = c3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5)
            f_m6 = c3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6)
            # weak (writes -1, 0)
            delta = jnp.clip(((m4 - m3) * 4 + m2 - m5 + 4) >> 3, -tc, tc)
            w_m3 = jnp.clip(m3 + delta, 0, pel_max)
            w_m4 = jnp.clip(m4 - delta, 0, pel_max)

            offs = (-3, -2, -1, 0, 1, 2)
            strong_h = (m1, m2, h_m3, h_m4, h_m5, h_m6)
            strong_f = (f_m1, f_m2, f_m3, f_m4, f_m5, f_m6)
            weak = (m1, m2, w_m3, w_m4, m5, m6)
            write_h = (False, False, True, True, True, True)
            write_f = (True, True, True, True, True, True)
            write_w = (False, False, True, True, False, False)
            for j, k in enumerate(offs):
                sv = jnp.where(hor_ctb, strong_h[j], strong_f[j])
                sm = jnp.where(hor_ctb, write_h[j], write_f[j])
                val = jnp.where(sw, sv, weak[j])
                wm = jnp.where(sw, sm, write_w[j])
                new_win = new_win.at[:, line, 4 + k].set(
                    jnp.where(wm, val, new_win[:, line, 4 + k]))
                wmask = wmask.at[:, line, 4 + k].set(
                    wmask[:, line, 4 + k] | wm)

        valid = (jnp.arange(N) < n_valid) & (bs > 0) & (~inactive)
        wmask = wmask & valid[:, None, None]
        flat = p32.reshape(-1)
        idx = (ryc * W + rxc).reshape(-1)
        upd = jnp.where(wmask, new_win, win).reshape(-1)
        do = wmask.reshape(-1)
        flat = flat.at[jnp.where(do, idx, flat.shape[0])].set(
            upd, mode="drop")
        return flat.reshape(H, W).astype(plane.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def _deblock_chroma_cells_fn(H: int, W: int, direction: int, bd: int,
                             loop_len: int, sub_shift: int, n_pad: int):
    return jax.jit(_deblock_chroma_cells_core(H, W, direction, bd,
                                              loop_len, sub_shift, n_pad))


def _pad_pow2(n: int, lo: int = 64) -> int:
    m = lo
    while m < n:
        m <<= 1
    return m


def deblock_frame_jax(cs: CodingStructure, planes: list[np.ndarray]) -> None:
    """In-place deblocking with strength derivation on host (native) and
    the per-direction cell filtering on device."""
    from vvdec_tpu.frame.deblock_np import Deblocker
    if all(s.deblocking_disabled for s in cs.shs):
        return
    db = Deblocker(cs, planes)
    db.derive_strengths()
    bd = cs.sps.bit_depth
    multi = len(cs.shs) > 1
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
            fn = _deblock_luma_cells_fn(planes[0].shape[0],
                                        planes[0].shape[1], dir_, bd,
                                        cs.sps.ctu_size, n_pad)
            planes[0][:] = np.asarray(fn(planes[0], cells, prm, n))
        if cs.num_comp > 1:
            _deblock_chroma_dir_jax(cs, db, planes, dir_, bd, multi)


def _deblock_chroma_dir_jax(cs, db, planes, dir_, bd, multi):
    """Chroma cell assembly (mirrors Deblocker._filter_chroma's native
    table) + device kernel."""
    ep = db.edges[dir_]
    sh = cs.sh
    sub_w, sub_h = cs.sub_w, cs.sub_h
    cw, chh = cs.comp_size[1]
    perp_step = 8
    par_step = 4 // sub_h if dir_ == 0 else 4 // sub_w
    sub_shift = sub_h - 1 if dir_ == 0 else sub_w - 1
    ctu_c_mask = (cs.sps.ctu_size // cs.sub_h) - 1
    c0s = np.arange(perp_step, (cw if dir_ == 0 else chh), perp_step)
    c1s = np.arange(0, (chh if dir_ == 0 else cw), par_step)
    if len(c0s) == 0 or len(c1s) == 0:
        return
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
    mask = (bs_cb_g > 0) | (bs_cr_g > 0)
    if not mask.any():
        return
    ccx_a = ccx_g[mask].astype(np.int32)
    ccy_a = ccy_g[mask].astype(np.int32)
    cx4_a = cx4_g[mask]
    cy4_a = cy4_g[mask]
    hor_ctb = ((dir_ == 1) & ((ccy_a & ctu_c_mask) == 0)).astype(np.int32)
    if multi:
        si = np.clip(cs.slice_map[cy4_a, cx4_a], 0, len(cs.shs) - 1)
    for k, comp in enumerate((1, 2)):
        bs_col = (bs_cb_g if comp == 1 else bs_cr_g)[mask]
        large_col = ep.cmfl[cy4_a, cx4_a]
        sel = (bs_col == 2) | ((large_col != 0) & (bs_col == 1))
        if not sel.any():
            continue
        n = int(sel.sum())
        n_pad = _pad_pow2(n)
        cells = np.zeros((n_pad, 2), dtype=np.int32)
        cells[:n, 0] = ccx_a[sel]
        cells[:n, 1] = ccy_a[sel]
        prm = np.zeros((n_pad, 6), dtype=np.int32)
        prm[:n, 0] = bs_col[sel]
        prm[:n, 1] = (ep.qp_cb if comp == 1 else ep.qp_cr)[cy4_a, cx4_a][sel]
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
        fn = _deblock_chroma_cells_fn(planes[comp].shape[0],
                                      planes[comp].shape[1], dir_, bd,
                                      par_step, sub_shift, n_pad)
        planes[comp][:] = np.asarray(fn(planes[comp], cells, prm, n))
