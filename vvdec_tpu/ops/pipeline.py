"""JAX device pipeline: batched reconstruction stages on TPU.

TPU-first design (SURVEY.md §7): the host CABAC stage emits whole-frame
coefficient planes and per-TU metadata; the device plane runs *batched* stage
kernels over all TUs of a frame grouped by shape:

  Stage 1  dequant + inverse transform   — two int32 matmuls per size class
           (bit-exact integer arithmetic; the MXU int8-split Pallas kernel is
           the planned fast path, this is the XLA reference)
  Stage 2  intra prediction + reconstruct — host for now (sequential TU
           dependency; device wavefront planned)
  Stage 3  deblocking                     — host numpy golden (device whole-
           frame stencil planned)

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


def itx_frame_jax(cs: CodingStructure) -> list[np.ndarray]:
    """Run stage 1 (dequant + inverse transform) for a whole frame on device.

    Returns per-component residual planes (int32) positioned at TU locations.
    """
    from vvdec_tpu.frame.recon_np import get_tr_types

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
            if cu.lfnst_idx:
                # LFNST TUs go through the host path (dequant + secondary
                # transform are interleaved); device LFNST stage planned
                from vvdec_tpu.frame.recon_np import (
                    apply_inv_lfnst, dequant_block, get_tr_types as gtt,
                    inverse_transform)
                qp = (tu.qp + cs.sps.qp_bd_offset) if comp == 0 \
                    else tu.chroma_qp[comp - 1]
                levels = cs.coef[comp][y: y + h, x: x + w]
                from vvdec_tpu.frame.recon_np import scaling_matrix_for
                deq = dequant_block(levels, qp, w.bit_length() - 1,
                                    h.bit_length() - 1, cs.sps.bit_depth,
                                    bool(cs.sh_of(cu).dep_quant_used),
                                    tu.max_scan_x[comp], tu.max_scan_y[comp],
                                    scale_mat=scaling_matrix_for(
                                        cs, tu, cu, comp))
                from vvdec_tpu.frame.recon_np import IntraReconstructor

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
                deq = apply_inv_lfnst(cs, deq, tu, cu, comp, fm)
                hor, ver = gtt(cs, tu, cu, comp)
                resi[comp][y: y + h, x: x + w] = inverse_transform(
                    deq, hor, ver, cs.sps.bit_depth)
                continue
            hor, ver = get_tr_types(cs, tu, cu, comp)
            qp = (tu.qp + cs.sps.qp_bd_offset) if comp == 0 else tu.chroma_qp[comp - 1]
            if cs.scaling_list is not None:
                from vvdec_tpu.frame.recon_np import scaling_matrix_for
                smat = scaling_matrix_for(cs, tu, cu, comp)
                lt = (0 if cu.pred_mode == MODE_INTRA else 3) + comp \
                    if smat is not None else None
            else:
                smat, lt = None, None
            dq = bool(cs.sh_of(cu).dep_quant_used)
            key = (comp != 0, w, h, hor, ver, lt, dq)
            groups.setdefault(key, []).append((comp, x, y, qp, smat))

    # launch every shape-group's device computation first (async dispatch),
    # then overlap the device->host readbacks — one blocking sync per frame
    # instead of one per group (the host<->device link is latency-bound)
    launched = []
    for (is_chroma, w, h, hor, ver, lt, dep_quant), items in groups.items():
        n = len(items)
        # bucket the batch dimension to powers of two so compiled shapes
        # are stable across frames (bounded number of XLA programs)
        n_pad = 1 << max(0, (n - 1)).bit_length()
        levels = np.zeros((n_pad, h, w), dtype=np.int32)
        for i, (comp, x, y, qp, _) in enumerate(items):
            levels[i] = cs.coef[comp][y: y + h, x: x + w]
        qps = np.zeros(n_pad, dtype=np.int32)
        qps[:n] = [qp for _, _, _, qp, _ in items]
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
        for (comp, x, y, _, _), blk in zip(items, host[:n]):
            bh, bw = blk.shape
            resi[comp][y: y + bh, x: x + bw] = blk
    return resi


def reconstruct_frame_jax(cs: CodingStructure) -> list[np.ndarray]:
    """Frame reconstruction with stage 1 on device, stages 2-3 on host."""
    from vvdec_tpu.frame.deblock_np import deblock_frame
    from vvdec_tpu.frame.recon_np import IntraReconstructor

    resi = itx_frame_jax(cs)
    r = IntraReconstructor(cs, residual_planes=resi)
    planes = r.run()
    deblock_frame(cs, planes)
    return planes


# ======================================================================
# Stage 4: SAO — whole-frame device kernel
# ======================================================================
@functools.lru_cache(maxsize=None)
def _sao_apply_fn(h: int, w: int, bd: int):
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

    return jax.jit(apply)


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
def _alf_diamond_fn(h: int, w: int, bd: int, n_taps: int):
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

    return jax.jit(apply)


@functools.lru_cache(maxsize=None)
def _ccalf_fn(hc: int, wc: int, bd: int, scale_x: int, scale_y: int):
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

    return jax.jit(apply)


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
