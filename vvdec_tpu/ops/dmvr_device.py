"""Device (TPU) DMVR + BDOF: decoder-side MV refinement and
bi-directional optical flow inside the device decode path.

DMVR's refined motion is DATA-DEPENDENT: the 25-point SAD search and
parametric sub-pel fit decide the final gather positions.  The
TPU-native resolution: the search, the argmin/threshold decision, the
sub-pel error-surface fit, the final 8/4-tap MC at the refined MV, and
the per-subblock BDOF blend all run as traced integer programs on
device — the refined MVs never visit the host mid-frame.  The only
readback is one tiny [Nsub, 4] refined-MV tensor per frame, resolved
lazily when the decoder writes the motion-field fixups (the analog of
DecCu::TaskFinishMotionInfo, DecCu.cpp:161-213).

The reference re-reads the refined position through a pad-limited
prefetch window around the ORIGINAL merge MV (xPrefetchPad,
InterPrediction.cpp:1525 + paddingCore<2> :283): sample coords clamp to
that window first, then to the picture.  Both clamps are reproduced
here as index arithmetic on a device patch (dynamic_slice +
take_along_axis), selected per subblock between the window path
(integer position moved) and the plain picture-clamped path.

Bit-exact parity targets: InterPrediction::xProcessDMVR
(/root/reference/source/Lib/CommonLib/InterPrediction.cpp:1847),
xBIPMVRefine (:1709), xSubPelErrorSrfc (:1656), xFinalPaddedMCForDMVR
(:1736), applyBiOptFlow (:1290), xSubPuBio (:551).  Host golden:
frame/dmvr_np.py + frame/recon_np.py _dmvr_mc/_bdof_mc (oracle-tested
against vvdecapp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vvdec_tpu.ops.mc_device import (
    IF_INTERNAL_OFFS,
    bdof_blend_core,
    bi_combine_core,
    dmvr_sad25_core,
    mc_batch_core,
    mc_coeff_rows,
)

DMVR_ITER = 2
DMVR_SUBCU = 16
BDOF_REGION = 16


def _tables():
    from vvdec_tpu.frame.inter_np import (
        ALT_HPEL_IF, BILINEAR_IF, CHROMA_IF, LUMA_IF)
    return LUMA_IF, CHROMA_IF, BILINEAR_IF, ALT_HPEL_IF


# ----------------------------------------------------------------------
# bilinear pre-MC (xinitMC; 2-tap at 10-bit precision)
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def bilin_cu_core(bw: int, bh: int, bd: int, hp: int, wp: int,
                  n_refs: int):
    """CU-wide bilinear buffers [N, bh, bw] (bh/bw include the 2*ITER
    margin).  Fraction-0 rides the identity row (16, 0) — bit-exact with
    the copy/H-only/V-only branches of dmvr_np.bilinear_pred for
    bd <= 10 (the shifts compose to the same rounding)."""
    sh1 = 4 - (10 - bd)  # IF_PREC_BILINEAR - (10-bit prec - bd)

    @jax.jit
    def apply(refs, y0, x0, ridx, cfy, cfx):
        def one(r, y, x):
            return lax.dynamic_slice(refs, (r, y, x),
                                     (1, bh + 1, bw + 1))[0]

        win = jax.vmap(one)(ridx, y0, x0).astype(jnp.int32)
        tmp = (win[:, :, 0:bw] * cfx[:, 0, None, None]
               + win[:, :, 1:bw + 1] * cfx[:, 1, None, None]
               + (1 << (sh1 - 1))) >> sh1
        return (tmp[:, 0:bh, :] * cfy[:, 0, None, None]
                + tmp[:, 1:bh + 1, :] * cfy[:, 1, None, None] + 8) >> 4

    return apply


# ----------------------------------------------------------------------
# 25-point decision + parametric sub-pel (xBIPMVRefine/xSubPelErrorSrfc)
# ----------------------------------------------------------------------
def _div_for_maxq7(n, d):
    """xDivForMaxq7 vectorized (3-step non-restoring divide)."""
    sign = n < 0
    n = jnp.abs(n)
    d = d << 3
    ge = n >= d
    q = ge.astype(jnp.int32)
    n = n - jnp.where(ge, d, 0)
    q = q << 1
    d = d >> 1
    ge = n >= d
    q = q + ge
    n = n - jnp.where(ge, d, 0)
    q = q << 1
    q = q + (n >= (d >> 1))
    return jnp.where(sign, -q, q)


def _subpel_axis(sc, s1, s3):
    num = (s1 - s3) * 16
    den = s1 + s3 - 2 * sc
    q = _div_for_maxq7(num, jnp.where(den == 0, 1, den))
    edge = jnp.where(s1 == sc, -8, 8)
    inner = (s1 != sc) & (s3 != sc)
    return jnp.where(den == 0, 0, jnp.where(inner, q, edge))


@functools.lru_cache(maxsize=None)
def dmvr_decide_core(dx: int, dy: int):
    """sads [N, 25] (raster, centre at 12) -> (dmv [N, 2] 1/16-pel,
    min_cost [N]).  Reproduces dmvr_np.dmvr_search exactly: reduced
    centre early-exit, strict-less raster argmin with centre preference
    on ties, ring cells skip the sub-pel fit."""
    thres = dx * dy

    @jax.jit
    def apply(sads):
        center = sads[:, 12]
        mc0 = center - (center >> 2)
        early = mc0 < thres
        s = sads.at[:, 12].set(mc0)
        # strict-less scan == first-argmin among cells, centre wins ties
        s2 = (s * 2).at[:, 12].add(-1)
        bidx = jnp.argmin(s2, axis=1).astype(jnp.int32)
        bcost = jnp.take_along_axis(s, bidx[:, None], axis=1)[:, 0]
        bhor = bidx % 5 - 2
        bver = bidx // 5 - 2
        inner = (jnp.abs(bhor) < 2) & (jnp.abs(bver) < 2)
        bi = jnp.where(inner, bidx, 12)

        def at(off):
            return jnp.take_along_axis(s, (bi + off)[:, None], axis=1)[:, 0]

        dmx = _subpel_axis(at(0), at(-1), at(1))
        dmy = _subpel_axis(at(0), at(-5), at(5))
        tx = bhor * 16 + jnp.where(inner, dmx, 0)
        ty = bver * 16 + jnp.where(inner, dmy, 0)
        dmv = jnp.stack([jnp.where(early, 0, tx),
                         jnp.where(early, 0, ty)], axis=1)
        cost = jnp.where(early, mc0, bcost)
        return dmv, cost

    return apply


# ----------------------------------------------------------------------
# final MC at the refined MV (xFinalPaddedMCForDMVR)
# ----------------------------------------------------------------------
def _clip18(v):
    return jnp.clip(v, -(1 << 17), (1 << 17) - 1)


@functools.lru_cache(maxsize=None)
def dmvr_final_core(bw: int, bh: int, comp: int, shx: int, shy: int,
                    bd: int, hp: int, wp: int, n_refs: int, m: int,
                    W: int, H: int, with_ext: bool):
    """Final MC for one DMVR subblock class and one component, refined
    MV traced.  comp 0: 8-tap + optional BDOF ext borders; chroma:
    4-tap, fractions in 1/32.  Returns blk [N, bh, bw] 14-bit
    (+ ext [N, bh+2, bw+2] when with_ext)."""
    taps = 8 if comp == 0 else 4
    half = taps // 2 - 1
    head = max(2, 14 - bd)
    s1 = 6 - head
    Kw, Kh = bw + taps - 1, bh + taps - 1
    luma_t, chroma_t, _, alt_t = _tables()
    tab = jnp.asarray(luma_t if comp == 0 else chroma_t, dtype=jnp.int32)
    alt_row = jnp.asarray(alt_t, dtype=jnp.int32)
    fsc = 5 - shx if comp else 0   # chroma fraction upscale (per axis)
    fsy = 5 - shy if comp else 0

    @jax.jit
    def apply(refs, ridx, bx, by, mv0x, mv0y, bxmin, bxmax, bymin, bymax,
              dmvx, dmvy, alt):
        rmvx = _clip18(mv0x + dmvx)
        rmvy = _clip18(mv0y + dmvy)
        mvcx = jnp.clip(rmvx, bxmin, bxmax)
        mvcy = jnp.clip(rmvy, bymin, bymax)
        dix = (rmvx >> shx) - (mv0x >> shx)
        diy = (rmvy >> shy) - (mv0y >> shy)
        fx = (mvcx & ((1 << shx) - 1)) << fsc
        fy = (mvcy & ((1 << shy) - 1)) << fsy
        use_win = (dix != 0) | (diy != 0)
        # pad-limited window around the merge MV (xPrefetchPad)
        wmx = jnp.clip(mv0x - (half << shx), bxmin, bxmax)
        wmy = jnp.clip(mv0y - (half << shy), bymin, bymax)
        wx = bx + (wmx >> shx)
        wy = by + (wmy >> shy)

        def coords(base, w0, d, mvc, sh, K, lim, use):
            # FIR window positions, both paths, then picture clamp
            j = jnp.arange(K, dtype=jnp.int32)
            pw = jnp.clip(w0[:, None] + d[:, None] + j[None, :],
                          w0[:, None], w0[:, None] + K - 1)
            pp = base[:, None] + (mvc >> sh)[:, None] - half + j[None, :]
            return jnp.clip(jnp.where(use[:, None], pw, pp), 0, lim - 1)

        cols = coords(bx, wx, dix, mvcx, shx, Kw, W, use_win)
        rows = coords(by, wy, diy, mvcy, shy, Kh, H, use_win)
        if with_ext:
            # BDOF border coords, computed BEFORE the patch origin: the
            # window path's integer position carries the golden's +half
            # (xPrefetchPad passes int_x = (wmv>>sh) + d_int + half and
            # mc_from_view's x0 subtracts it again), and the border
            # origin can sit below the FIR window start, so the patch
            # must start at the true minimum of both index sets
            intx = jnp.where(use_win, (wmx >> shx) + dix + half,
                             mvcx >> shx)
            inty = jnp.where(use_win, (wmy >> shy) + diy + half,
                             mvcy >> shy)
            rx = bx + intx - 1 + (fx >= 8)
            ry = by + inty - 1 + (fy >= 8)
            je = jnp.arange(bw + 2, dtype=jnp.int32)
            ie = jnp.arange(bh + 2, dtype=jnp.int32)
            cew = jnp.clip(rx[:, None] + je[None, :], wx[:, None],
                           wx[:, None] + Kw - 1)
            ce = jnp.clip(jnp.where(use_win[:, None], cew,
                                    rx[:, None] + je[None, :]), 0, W - 1)
            rew = jnp.clip(ry[:, None] + ie[None, :], wy[:, None],
                           wy[:, None] + Kh - 1)
            re = jnp.clip(jnp.where(use_win[:, None], rew,
                                    ry[:, None] + ie[None, :]), 0, H - 1)
            py = jnp.minimum(rows[:, 0], re[:, 0])
            px = jnp.minimum(cols[:, 0], ce[:, 0])
        else:
            py = rows[:, 0]
            px = cols[:, 0]

        def one(r, y, x):
            # +2: the min-origin shift can push the FIR rows up to 2
            # beyond K relative to the patch start (margin covers it)
            return lax.dynamic_slice(refs, (r, y, x),
                                     (1, Kh + 2, Kw + 2))[0]

        patch = jax.vmap(one)(ridx, py + m, px + m).astype(jnp.int32)
        relr = rows - py[:, None]
        relc = cols - px[:, None]
        win = jnp.take_along_axis(
            jnp.take_along_axis(patch, relr[:, :, None], axis=1),
            relc[:, None, :], axis=2)
        cfx = tab[fx]
        cfy = tab[fy]
        if comp == 0:
            cfx = jnp.where((alt & (fx == 8))[:, None], alt_row, cfx)
            cfy = jnp.where((alt & (fy == 8))[:, None], alt_row, cfy)
        tmp = jnp.zeros((win.shape[0], Kh, bw), dtype=jnp.int32)
        for k in range(taps):
            tmp = tmp + win[:, :, k:k + bw] * cfx[:, k, None, None]
        tmp = (tmp - (IF_INTERNAL_OFFS << s1)) >> s1
        blk = jnp.zeros((win.shape[0], bh, bw), dtype=jnp.int32)
        for k in range(taps):
            blk = blk + tmp[:, k:k + bh, :] * cfy[:, k, None, None]
        blk = blk >> 6
        if not with_ext:
            return blk
        # BDOF integer-sample borders at the nearest-integer position
        # (xPredInterBlk bio tail, InterPrediction.cpp:863-889)
        ew = jnp.take_along_axis(
            jnp.take_along_axis(patch, (re - py[:, None])[:, :, None],
                                axis=1),
            (ce - px[:, None])[:, None, :], axis=2)
        ext = (ew << head) - IF_INTERNAL_OFFS
        ext = ext.at[:, 1:bh + 1, 1:bw + 1].set(blk)
        return blk, ext

    return apply


@functools.lru_cache(maxsize=None)
def _fixup_mv_core():
    @jax.jit
    def apply(m0x, m0y, m1x, m1y, dmv):
        return jnp.stack([_clip18(m0x + dmv[:, 0]),
                          _clip18(m0y + dmv[:, 1]),
                          _clip18(m1x - dmv[:, 0]),
                          _clip18(m1y - dmv[:, 1])], axis=1)

    return apply


@functools.lru_cache(maxsize=None)
def _bdof_select_core(dx: int, dy: int, bd: int):
    """where(bio_sub, bdof_blend, bi_average) for DMVR subblocks."""
    blend = bdof_blend_core(dx, dy, bd)
    head = max(2, 14 - bd)
    sh = head + 1
    off = (1 << (sh - 1)) + 2 * IF_INTERNAL_OFFS
    pel_max = (1 << bd) - 1

    @jax.jit
    def apply(blk0, blk1, ext0, ext1, bio):
        avg = jnp.clip((blk0 + blk1 + off) >> sh, 0, pel_max)
        bd_out = blend(ext0, ext1)
        return jnp.where(bio[:, None, None], bd_out, avg)

    return apply


@functools.lru_cache(maxsize=None)
def mc_ext_core(bw: int, bh: int, bd: int, hp: int, wp: int,
                n_refs: int):
    """14-bit MC + BDOF ext borders for STATIC positions (standalone
    BDOF regions: merge MV unrefined, fractions host-known).
    apply(refs, y0, x0 (FIR origin, padded), yb, xb (border origin,
    padded), ridx, cfy, cfx [N, 8]) -> ext [N, bh+2, bw+2]."""
    taps = 8
    head = max(2, 14 - bd)
    s1 = 6 - head
    Kw, Kh = bw + taps - 1, bh + taps - 1

    @jax.jit
    def apply(refs, y0, x0, yb, xb, ridx, cfy, cfx):
        def one(r, y, x):
            return lax.dynamic_slice(refs, (r, y, x), (1, Kh, Kw))[0]

        win = jax.vmap(one)(ridx, y0, x0).astype(jnp.int32)
        tmp = jnp.zeros((win.shape[0], Kh, bw), dtype=jnp.int32)
        for k in range(taps):
            tmp = tmp + win[:, :, k:k + bw] * cfx[:, k, None, None]
        tmp = (tmp - (IF_INTERNAL_OFFS << s1)) >> s1
        blk = jnp.zeros((win.shape[0], bh, bw), dtype=jnp.int32)
        for k in range(taps):
            blk = blk + tmp[:, k:k + bh, :] * cfy[:, k, None, None]
        blk = blk >> 6

        def oneb(r, y, x):
            return lax.dynamic_slice(refs, (r, y, x),
                                     (1, bh + 2, bw + 2))[0]

        s = jax.vmap(oneb)(ridx, yb, xb).astype(jnp.int32)
        ext = (s << head) - IF_INTERNAL_OFFS
        return ext.at[:, 1:bh + 1, 1:bw + 1].set(blk)

    return apply


class LazyDmvrFixups:
    """cs.dmvr_fixups stand-in for the device path: iterating resolves
    the tiny refined-MV readbacks (one [Nsub, 4] tensor per DMVR size
    class) and yields (x2, y2, mv0, mv1) records in subblock order."""

    def __init__(self):
        self._parts: list = []  # (positions [(x2, y2, subidx)], dev [N,4])

    def add(self, positions, dev_arr) -> None:
        self._parts.append((positions, dev_arr))

    def __iter__(self):
        for positions, arr in self._parts:
            a = np.asarray(arr)
            for x2, y2, k in positions:
                yield (x2, y2, (int(a[k, 0]), int(a[k, 1])),
                       (int(a[k, 2]), int(a[k, 3])))

    def __bool__(self):
        return bool(self._parts)


# ----------------------------------------------------------------------
# frame-level drivers
# ----------------------------------------------------------------------
def run_dmvr_groups(cs, dmvr_groups, padded, margin, scatters,
                    fixups: LazyDmvrFixups) -> None:
    """Device DMVR (+ per-subblock BDOF) for all DMVR CUs, grouped by CU
    size.  Appends final-sample scatters and refined-MV fixups."""
    from vvdec_tpu.frame.inter_np import clip_mv

    bd = cs.sps.bit_depth
    _, _, bilinear_t, _ = _tables()
    ctu = cs.sps.ctu_size
    for (w, h), entries in dmvr_groups.items():
        cus = [e[0] for e in entries]
        bioap = np.array([e[1] for e in entries])
        N = len(cus)
        dx = min(w, DMVR_SUBCU)
        dy = min(h, DMVR_SUBCU)
        grid = [(ys, xs) for ys in range(0, h, dy)
                for xs in range(0, w, dx)]
        ng = len(grid)
        bw2, bh2 = w + 2 * DMVR_ITER, h + 2 * DMVR_ITER
        # --- bilinear CU buffers per list ---
        bls = []
        refs_cache: list = []
        ridx_map: dict = {}
        ridx_l = np.zeros((2, N), np.int32)
        mrg = np.zeros((2, N, 2), np.int32)   # merge MVs
        for lst in (0, 1):
            y0 = np.zeros(N, np.int32)
            x0 = np.zeros(N, np.int32)
            cf = np.zeros((2, N, 2), np.int32)
            for j, cu in enumerate(cus):
                mrg[lst, j] = cu.mv[lst]
                pl = padded(lst, cu.ref_idx[lst], 0, margin)
                k = id(pl)
                if k not in ridx_map:
                    ridx_map[k] = len(refs_cache)
                    refs_cache.append(pl)
                ridx_l[lst, j] = ridx_map[k]
                mvc = clip_mv(tuple(cu.mv[lst]), cu.x, cu.y, cs,
                              size=(w, h))
                mvb = (mvc[0] - (DMVR_ITER << 4), mvc[1] - (DMVR_ITER << 4))
                x0[j] = cu.x + (mvb[0] >> 4) + margin
                y0[j] = cu.y + (mvb[1] >> 4) + margin
                cf[0, j] = bilinear_t[mvb[0] & 15]
                cf[1, j] = bilinear_t[mvb[1] & 15]
            rstack = jnp.stack(refs_cache)
            fn = bilin_cu_core(bw2, bh2, bd, int(rstack.shape[1]),
                               int(rstack.shape[2]), len(refs_cache))
            bls.append(fn(rstack, jnp.asarray(y0), jnp.asarray(x0),
                          jnp.asarray(ridx_l[lst]),
                          jnp.asarray(cf[1]), jnp.asarray(cf[0])))
        # --- per-subblock search (grid-major subblock order) ---
        subs = [jnp.concatenate(
            [bl[:, ys:ys + dy + 4, xs:xs + dx + 4] for ys, xs in grid],
            axis=0) for bl in bls]
        sads = dmvr_sad25_core(dx, dy)(subs[0], subs[1])
        dmv, cost = dmvr_decide_core(dx, dy)(sads)
        thres = 2 * dx * dy
        bio_sub = jnp.asarray(np.tile(bioap, ng)) & (cost >= thres)
        # --- subblock metadata (grid-major order to match subs) ---
        ns = N * ng
        sbx = np.zeros(ns, np.int32)
        sby = np.zeros(ns, np.int32)
        for g, (ys, xs) in enumerate(grid):
            for j, cu in enumerate(cus):
                sbx[g * N + j] = cu.x + xs
                sby[g * N + j] = cu.y + ys
        bxmin = (-ctu - 8 - sbx + 1) << 4
        bxmax = (cs.w + 8 - sbx - 1) << 4
        bymin = (-ctu - 8 - sby + 1) << 4
        bymax = (cs.h + 8 - sby - 1) << 4
        alt = np.tile(np.array([cu.alt_hpel for cu in cus]), ng)
        m0 = np.tile(mrg[0], (ng, 1))
        m1 = np.tile(mrg[1], (ng, 1))
        ridx_s = [np.tile(ridx_l[lst], ng) for lst in (0, 1)]
        rstack = jnp.stack(refs_cache)
        hp, wp = int(rstack.shape[1]), int(rstack.shape[2])
        # --- final MC (luma with ext, chroma plain) per list ---
        outs = {}
        for lst in (0, 1):
            mv0 = m0 if lst == 0 else m1
            sgn = 1 if lst == 0 else -1
            fn = dmvr_final_core(dx, dy, 0, 4, 4, bd, hp, wp,
                                 len(refs_cache), margin, cs.w, cs.h,
                                 True)
            blk, ext = fn(rstack, jnp.asarray(ridx_s[lst]),
                          jnp.asarray(sbx), jnp.asarray(sby),
                          jnp.asarray(mv0[:, 0]), jnp.asarray(mv0[:, 1]),
                          jnp.asarray(bxmin), jnp.asarray(bxmax),
                          jnp.asarray(bymin), jnp.asarray(bymax),
                          sgn * dmv[:, 0], sgn * dmv[:, 1],
                          jnp.asarray(alt))
            outs[(lst, 0)] = (blk, ext)
        outl = _bdof_select_core(dx, dy, bd)(
            outs[(0, 0)][0], outs[(1, 0)][0],
            outs[(0, 0)][1], outs[(1, 0)][1], bio_sub)
        for g, (ys, xs) in enumerate(grid):
            for j, cu in enumerate(cus):
                scatters.append((0, cu.x + xs, cu.y + ys,
                                 outl[g * N + j], False))
        if cs.num_comp > 1:
            shx = 4 + (cs.sub_w - 1)
            shy = 4 + (cs.sub_h - 1)
            cdx, cdy = dx // cs.sub_w, dy // cs.sub_h
            for comp in (1, 2):
                crefs: list = []
                cmap: dict = {}
                cridx = np.zeros((2, N), np.int32)
                for lst in (0, 1):
                    for j, cu in enumerate(cus):
                        pl = padded(lst, cu.ref_idx[lst], comp,
                                    margin // cs.sub_h)
                        k = id(pl)
                        if k not in cmap:
                            cmap[k] = len(crefs)
                            crefs.append(pl)
                        cridx[lst, j] = cmap[k]
                crstack = jnp.stack(crefs)
                wc, hc = cs.comp_size[comp]
                parts = []
                for lst in (0, 1):
                    mv0 = m0 if lst == 0 else m1
                    sgn = 1 if lst == 0 else -1
                    fn = dmvr_final_core(
                        cdx, cdy, comp, shx, shy, bd,
                        int(crstack.shape[1]), int(crstack.shape[2]),
                        len(crefs), margin // cs.sub_h, wc, hc, False)
                    parts.append(fn(
                        crstack, jnp.asarray(np.tile(cridx[lst], ng)),
                        jnp.asarray(sbx // cs.sub_w),
                        jnp.asarray(sby // cs.sub_h),
                        jnp.asarray(mv0[:, 0]), jnp.asarray(mv0[:, 1]),
                        jnp.asarray(bxmin), jnp.asarray(bxmax),
                        jnp.asarray(bymin), jnp.asarray(bymax),
                        sgn * dmv[:, 0], sgn * dmv[:, 1],
                        jnp.asarray(alt)))
                outc = bi_combine_core(cdx, cdy, bd)(
                    parts[0], parts[1],
                    jnp.full(ns, 4, dtype=jnp.int32))
                for g, (ys, xs) in enumerate(grid):
                    for j, cu in enumerate(cus):
                        scatters.append((
                            comp, (cus[j].x + xs) // cs.sub_w,
                            (cus[j].y + ys) // cs.sub_h,
                            outc[g * N + j], False))
        # --- refined-MV writeback records (TaskFinishMotionInfo) ---
        mvout = _fixup_mv_core()(
            jnp.asarray(m0[:, 0]), jnp.asarray(m0[:, 1]),
            jnp.asarray(m1[:, 0]), jnp.asarray(m1[:, 1]), dmv)
        positions = []
        for g, (ys, xs) in enumerate(grid):
            for j, cu in enumerate(cus):
                sx_abs, sy_abs = cu.x + xs, cu.y + ys
                y2 = ((sy_abs - 1) & ~7) + 8
                while y2 < sy_abs + dy:
                    x2 = ((sx_abs - 1) & ~7) + 8
                    while x2 < sx_abs + dx:
                        positions.append((x2, y2, g * N + j))
                        x2 += 8
                    y2 += 8
        fixups.add(positions, mvout)


def run_bdof_groups(cs, bdof_groups, padded, margin, scatters) -> None:
    """Standalone BDOF (no DMVR): 16x16 application regions with static
    positions — merge MVs unrefined (xSubPuBio)."""
    from vvdec_tpu.frame.inter_np import clip_mv

    bd = cs.sps.bit_depth
    for (w, h), cus in bdof_groups.items():
        N = len(cus)
        tw = min(BDOF_REGION, w)
        th = min(BDOF_REGION, h)
        grid = [(ty, tx) for ty in range(0, h, th)
                for tx in range(0, w, tw)]
        ng = len(grid)
        ns = N * ng
        # --- luma ext per list (static positions) ---
        exts = []
        for lst in (0, 1):
            refs_cache: list = []
            ridx_map: dict = {}
            y0 = np.zeros(ns, np.int32)
            x0 = np.zeros(ns, np.int32)
            yb = np.zeros(ns, np.int32)
            xb = np.zeros(ns, np.int32)
            ridx = np.zeros(ns, np.int32)
            fxa = np.zeros(ns, np.int32)
            fya = np.zeros(ns, np.int32)
            alth = np.zeros(ns, bool)
            for g, (ty, tx) in enumerate(grid):
                for j, cu in enumerate(cus):
                    k2 = g * N + j
                    mvc = clip_mv(tuple(cu.mv[lst]), cu.x, cu.y, cs,
                                  size=(w, h))
                    pl = padded(lst, cu.ref_idx[lst], 0, margin)
                    ki = id(pl)
                    if ki not in ridx_map:
                        ridx_map[ki] = len(refs_cache)
                        refs_cache.append(pl)
                    ridx[k2] = ridx_map[ki]
                    ix, iy = mvc[0] >> 4, mvc[1] >> 4
                    fx, fy = mvc[0] & 15, mvc[1] & 15
                    x0[k2] = cu.x + tx + ix - 3 + margin
                    y0[k2] = cu.y + ty + iy - 3 + margin
                    xb[k2] = cu.x + tx + ix - 1 + (1 if fx >= 8 else 0) \
                        + margin
                    yb[k2] = cu.y + ty + iy - 1 + (1 if fy >= 8 else 0) \
                        + margin
                    fxa[k2], fya[k2] = fx, fy
                    alth[k2] = cu.alt_hpel
            cfx = mc_coeff_rows(fxa, 0, alt_hpel=alth)
            cfy = mc_coeff_rows(fya, 0, alt_hpel=alth)
            rstack = jnp.stack(refs_cache)
            fn = mc_ext_core(tw, th, bd, int(rstack.shape[1]),
                             int(rstack.shape[2]), len(refs_cache))
            exts.append(fn(rstack, jnp.asarray(y0), jnp.asarray(x0),
                           jnp.asarray(yb), jnp.asarray(xb),
                           jnp.asarray(ridx), jnp.asarray(cfy),
                           jnp.asarray(cfx)))
        outl = bdof_blend_core(tw, th, bd)(exts[0], exts[1])
        for g, (ty, tx) in enumerate(grid):
            for j, cu in enumerate(cus):
                scatters.append((0, cu.x + tx, cu.y + ty,
                                 outl[g * N + j], False))
        # --- chroma: plain 14-bit MC + bi-average per region ---
        if cs.num_comp > 1:
            shx = 4 + (cs.sub_w - 1)
            shy = 4 + (cs.sub_h - 1)
            ctw, cth = tw // cs.sub_w, th // cs.sub_h
            for comp in (1, 2):
                parts = []
                for lst in (0, 1):
                    refs_cache = []
                    ridx_map = {}
                    y0 = np.zeros(ns, np.int32)
                    x0 = np.zeros(ns, np.int32)
                    ridx = np.zeros(ns, np.int32)
                    fxa = np.zeros(ns, np.int32)
                    fya = np.zeros(ns, np.int32)
                    for g, (ty, tx) in enumerate(grid):
                        for j, cu in enumerate(cus):
                            k2 = g * N + j
                            mvc = clip_mv(tuple(cu.mv[lst]), cu.x, cu.y,
                                          cs, size=(w, h))
                            pl = padded(lst, cu.ref_idx[lst], comp,
                                        margin // cs.sub_h)
                            ki = id(pl)
                            if ki not in ridx_map:
                                ridx_map[ki] = len(refs_cache)
                                refs_cache.append(pl)
                            ridx[k2] = ridx_map[ki]
                            fx = (mvc[0] & ((1 << shx) - 1)) << (5 - shx)
                            fy = (mvc[1] & ((1 << shy) - 1)) << (5 - shy)
                            x0[k2] = (cu.x + tx) // cs.sub_w \
                                + (mvc[0] >> shx) - 1 \
                                + margin // cs.sub_h
                            y0[k2] = (cu.y + ty) // cs.sub_h \
                                + (mvc[1] >> shy) - 1 \
                                + margin // cs.sub_h
                            fxa[k2], fya[k2] = fx, fy
                    cfx = mc_coeff_rows(fxa, 1)
                    cfy = mc_coeff_rows(fya, 1)
                    rstack = jnp.stack(refs_cache)
                    fn = mc_batch_core(ctw, cth, 4, bd,
                                       int(rstack.shape[1]),
                                       int(rstack.shape[2]),
                                       len(refs_cache))
                    parts.append(fn(rstack, jnp.asarray(y0),
                                    jnp.asarray(x0), jnp.asarray(ridx),
                                    jnp.asarray(cfy), jnp.asarray(cfx),
                                    jnp.ones(ns, dtype=bool)))
                outc = bi_combine_core(ctw, cth, bd)(
                    parts[0], parts[1],
                    jnp.full(ns, 4, dtype=jnp.int32))
                for g, (ty, tx) in enumerate(grid):
                    for j, cu in enumerate(cus):
                        scatters.append((
                            comp, (cu.x + tx) // cs.sub_w,
                            (cu.y + ty) // cs.sub_h,
                            outc[g * N + j], False))
