"""Dense whole-frame deblocking kernels (gather/scatter-free).

Replaces the batched edge-cell formulation (the cell kernels in
ops/pipeline.py) inside the device filter chain.  Every pixel evaluates
the full VVC edge-filter decision tree *as if an edge sat at its own
column*; results are then routed from the true 4-grid (8-grid chroma)
edge positions to the written pixels by compile-time phase masks and
constant shifts.  All reads are static pad+slice windows; all per-cell
parameters ride one packed int16 grid per direction, expanded on device
by broadcasts — no gather, no scatter, no strided slice (the access
forms that dominate runtime on TPU; the gather/scatter cell kernel costs
~80 ms per launch at 832x480 over this backend, the dense form fuses
into the elementwise chain).

Horizontal edges run the same core on transposed planes/grids.

Parity targets: LoopFilter::xEdgeFilterLuma / xEdgeFilterChroma
(/root/reference/source/Lib/CommonLib/LoopFilter.cpp:851-1210).  The
batched-cell kernels in ops/pipeline.py are the host-verified bit-exact
reference implementations for these dense forms.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# spec tables (shared with the cell kernels)
from vvdec_tpu.ops.pipeline import _DB_BETA, _DB_DB, _DB_TC, _DB_TCC

# ---------------------------------------------------------------------
# packed per-cell grid layouts (int16, one per direction)
#   luma:   bs(2) | qp(7)<<2 | max_fl_p(3)<<9 | max_fl_q(3)<<12
#   chroma: bs(2) | qp(7)<<2 | large(1)<<9          (one grid per comp)
# slice-level tc/beta offsets ride a tiny [n_sl, 6] table selected by a
# per-cell slice-index grid (cols: y_tc, y_beta, cb_tc, cb_beta, cr_tc,
# cr_beta).
# ---------------------------------------------------------------------


def pack_luma_grid(ep) -> np.ndarray:
    """EdgeParams -> packed int16 [h4, w4] luma grid."""
    return (ep.bs_y.astype(np.int32)
            | (ep.qp_y.astype(np.int32) << 2)
            | (ep.max_fl_p.astype(np.int32) << 9)
            | (ep.max_fl_q.astype(np.int32) << 12)).astype(np.int16)


def pack_chroma_grid(ep, comp: int) -> np.ndarray:
    """EdgeParams -> packed int16 [h4, w4] chroma grid for comp (1|2)."""
    bs = (ep.bs_cb if comp == 1 else ep.bs_cr).astype(np.int32)
    qp = (ep.qp_cb if comp == 1 else ep.qp_cr).astype(np.int32)
    return (bs | (qp << 2)
            | ((ep.cmfl.astype(np.int32) != 0) << 9)).astype(np.int16)


def _seg(v, r: int, L: int):
    """Broadcast row r of every L-row segment to the whole segment."""
    H, W = v.shape
    v3 = v.reshape(H // L, L, W)
    return jnp.broadcast_to(v3[:, r: r + 1, :], (H // L, L, W)) \
        .reshape(H, W)


def _sh(a, r: int):
    """S[y, x] = a[y, x - r], zero fill outside."""
    if r == 0:
        return a
    W = a.shape[1]
    if r > 0:
        return jnp.pad(a, ((0, 0), (r, 0)))[:, :W]
    return jnp.pad(a, ((0, 0), (0, -r)))[:, -r:]


def _sel3(cls_, v0, v1, v2):
    return jnp.where(cls_ == 0, v0, jnp.where(cls_ == 1, v1, v2))


def _sl_sel(si, sltab, col: int, n_sl: int):
    acc = jnp.broadcast_to(sltab[0, col], si.shape)
    for s in range(1, n_sl):
        acc = jnp.where(si == s, sltab[s, col], acc)
    return acc


def _tc_of(idx, bd: int):
    t = jnp.asarray(_DB_TC)[idx]
    if bd >= 10:
        return t << (bd - 10)
    return (t + (1 << (9 - bd))) >> (10 - bd)


@functools.lru_cache(maxsize=None)
def deblock_luma_dense_core(H: int, W: int, bd: int, ctu: int, dir1: bool,
                            n_sl: int):
    """Dense luma edge filter; edges vertical on 4-grid columns.

    apply(plane [H, W], grid [H4, W4] int16, si [H4, W4] int16,
          sltab [n_sl, 6] int32) -> filtered plane.
    For the horizontal direction the caller transposes plane and grids
    (dir1 only toggles the no-large-P-at-CTU-boundary rule)."""
    pel_max = (1 << bd) - 1
    H4, W4 = H // 4, W // 4
    xs = np.arange(W)
    phase_m = [jnp.asarray((xs & 3) == p) for p in range(4)]
    # dir 1: P side never "large" when the edge sits on a CTU row
    cell_ctb = jnp.asarray(((4 * np.arange(W4)) % ctu) == 0)[None, :]

    def E(v):
        return jnp.repeat(jnp.repeat(v, 4, 0), 4, 1)

    def apply(plane, grid, si, sltab):
        P = plane.astype(jnp.int32)
        pad = jnp.pad(P, ((0, 0), (8, 8)), mode="edge")

        def A(k):
            return pad[:, 8 + k: 8 + k + W]

        g = grid.astype(jnp.int32)
        bs4 = g & 3
        qp4 = (g >> 2) & 127
        mfp4 = (g >> 9) & 7
        mfq4 = (g >> 12) & 7
        tco4 = _sl_sel(si, sltab, 0, n_sl)
        bto4 = _sl_sel(si, sltab, 1, n_sl)
        sp_l4 = mfp4 > 3
        if dir1:
            sp_l4 = sp_l4 & (~cell_ctb)
        sq_l4 = mfq4 > 3
        idx_tc4 = jnp.clip(qp4 + 2 * (bs4 - 1) + 2 * tco4, 0, 65)
        idx_b4 = jnp.clip(qp4 + 2 * bto4, 0, 63)
        tc4 = _tc_of(idx_tc4, bd)
        beta4 = jnp.asarray(_DB_BETA)[idx_b4] << (bd - 8)
        n_p4 = jnp.where(sp_l4, mfp4, 3)
        n_q4 = jnp.where(sq_l4, mfq4, 3)
        np_cls4 = jnp.clip((n_p4 - 3) >> 1, 0, 2)
        nq_cls4 = jnp.clip((n_q4 - 3) >> 1, 0, 2)
        valid4 = (bs4 > 0) & ~((beta4 == 0) & (tc4 == 0))

        # pixel-resolution parameter maps
        bs_v = E(valid4)
        tc = E(tc4)
        beta = E(beta4)
        sp_large = E(sp_l4)
        sq_large = E(sq_l4)
        mfp = E(mfp4)
        mfq = E(mfq4)
        n_p = E(n_p4)
        n_q = E(n_q4)
        np_cls = E(np_cls4)
        nq_cls = E(nq_cls4)
        side_thresh = (beta + (beta >> 1)) >> 3
        thr_cut = tc * 10
        tc5 = (tc * 5 + 1) >> 1

        m3, m4 = A(-1), A(0)
        absm34 = jnp.abs(m3 - m4)

        # ---- decisions (per-pixel, then segment-row broadcast) ----
        dp = jnp.abs(A(-3) - 2 * A(-2) + A(-1))
        dq = jnp.abs(A(0) - 2 * A(1) + A(2))
        dpx = jnp.abs(A(-6) - 2 * A(-5) + A(-4))
        dqx = jnp.abs(A(3) - 2 * A(4) + A(5))
        dpl = jnp.where(sp_large, (dp + dpx + 1) >> 1, dp)
        dql = jnp.where(sq_large, (dq + dqx + 1) >> 1, dq)
        dl = dpl + dql
        d0l, d3l = _seg(dl, 0, 4), _seg(dl, 3, 4)

        sp3 = jnp.abs(A(-4) - m3)
        sq3 = jnp.abs(A(3) - m4)
        mp4 = jnp.where(mfp == 7, A(-8), A(-6))
        m11 = jnp.where(mfq == 7, A(7), A(5))
        sp3_7 = sp3 + jnp.abs(A(-5) - A(-6) - A(-7) + mp4)
        sp3l = jnp.where(mfp == 7, sp3_7, sp3)
        sp3l = (sp3l + jnp.abs(A(-4) - mp4) + 1) >> 1
        sp3f = jnp.where(sp_large, sp3l, sp3)
        sq3_7 = sq3 + jnp.abs(A(4) - A(5) - A(6) + m11)
        sq3l = jnp.where(mfq == 7, sq3_7, sq3)
        sq3l = (sq3l + jnp.abs(m11 - A(3)) + 1) >> 1
        sq3f = jnp.where(sq_large, sq3l, sq3)
        d2 = 2 * dl
        usl = (d2 < (beta >> 2)) & (absm34 < tc5) \
            & ((sp3f + sq3f) < (beta * 3 >> 5)) & (d2 < (beta >> 4))
        sw_l = (sp_large | sq_large) & ((d0l + d3l) < beta) \
            & _seg(usl, 0, 4) & _seg(usl, 3, 4)

        dp0, dp3 = _seg(dp, 0, 4), _seg(dp, 3, 4)
        dq0, dq3 = _seg(dq, 0, 4), _seg(dq, 3, 4)
        d = dp0 + dq0 + dp3 + dq3
        filt_pq = (mfp > 1) & (mfq > 1)
        filter_p = filt_pq & ((dp0 + dp3) < side_thresh)
        filter_q = filt_pq & ((dq0 + dq3) < side_thresh)
        uss = (2 * (dp + dq) < (beta >> 2)) & (absm34 < tc5) \
            & ((sp3 + sq3) < (beta >> 3))
        sw = (mfp > 2) & (mfq > 2) & _seg(uss, 0, 4) & _seg(uss, 3, 4)
        reg_ok = (~sw_l) & (d < beta)

        # ---- long bilinear filter values ----
        ref_p = _sel3(np_cls, (A(-3) + A(-4) + 1) >> 1,
                      (A(-5) + A(-6) + 1) >> 1, (A(-7) + A(-8) + 1) >> 1)
        ref_q = _sel3(nq_cls, (A(2) + A(3) + 1) >> 1,
                      (A(4) + A(5) + 1) >> 1, (A(6) + A(7) + 1) >> 1)
        Pv = [A(-1 - j) for j in range(7)]
        Qv = [A(j) for j in range(7)]
        rm_55 = (2 * (Pv[0] + Qv[0] + Pv[1] + Qv[1] + Pv[2] + Qv[2])
                 + Pv[3] + Qv[3] + Pv[4] + Qv[4] + 8) >> 4
        rm_77 = (2 * (Pv[0] + Qv[0]) + Pv[1] + Qv[1] + Pv[2] + Qv[2]
                 + Pv[3] + Qv[3] + Pv[4] + Qv[4] + Pv[5] + Qv[5]
                 + Pv[6] + Qv[6] + 8) >> 4
        rm_75 = (2 * (Pv[0] + Qv[0] + Pv[1] + Qv[1]) + Pv[2] + Qv[2]
                 + Pv[3] + Qv[3] + Pv[4] + Qv[4] + Pv[5] + Qv[5] + 8) >> 4
        swapq = n_q > n_p
        pl = [jnp.where(swapq, Qv[j], Pv[j]) for j in range(7)]
        ql = [jnp.where(swapq, Pv[j], Qv[j]) for j in range(3)]
        rm_73 = (2 * (pl[0] + ql[0]) + ql[0] + 2 * (ql[1] + ql[2])
                 + pl[1] + ql[1] + pl[2] + pl[3] + pl[4] + pl[5]
                 + pl[6] + 8) >> 4
        rm_53 = (Pv[0] + Qv[0] + Pv[1] + Qv[1] + Pv[2] + Qv[2]
                 + Pv[3] + Qv[3] + 4) >> 3
        n_l = jnp.maximum(n_p, n_q)
        n_s = jnp.minimum(n_p, n_q)
        ref_m = jnp.where(
            (n_p == n_q) & (n_p == 5), rm_55,
            jnp.where(n_p == n_q, rm_77,
                      jnp.where((n_l == 7) & (n_s == 5), rm_75,
                                jnp.where((n_l == 7) & (n_s == 3),
                                          rm_73, rm_53))))

        def long_side(pos, refs, cls_, nn, vals):
            db = _sel3(cls_, int(_DB_DB[0][pos]), int(_DB_DB[1][pos]),
                       int(_DB_DB[2][pos]))
            tcc = _sel3(cls_, int(_DB_TCC[0][pos]), int(_DB_TCC[1][pos]),
                        int(_DB_TCC[2][pos]))
            cv = (tc * tcc) >> 1
            val = (ref_m * db + refs * (64 - db) + 32) >> 6
            new = jnp.maximum(vals[pos] - cv,
                              jnp.minimum(vals[pos] + cv, val))
            return new, nn > pos

        # ---- regular (strong / weak) filter values, offsets -3..2 ----
        m0, m1, m2 = A(-4), A(-3), A(-2)
        m5, m6, m7 = A(1), A(2), A(3)

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
        d1_ = jnp.clip((((m1 + m3 + 1) >> 1) - m2 + dcl) >> 1, -tc2, tc2)
        w_m2 = jnp.clip(m2 + d1_, 0, pel_max)
        d2_ = jnp.clip((((m6 + m4 + 1) >> 1) - m5 - dcl) >> 1, -tc2, tc2)
        w_m5 = jnp.clip(m5 + d2_, 0, pel_max)

        false_ = jnp.zeros_like(wk_on)
        true_ = jnp.ones_like(wk_on)
        reg_vals = (
            (s_m1, jnp.where(sw, true_, false_)),
            (jnp.where(sw, s_m2, w_m2),
             jnp.where(sw, true_, wk_on & filter_p)),
            (jnp.where(sw, s_m3, w_m3), jnp.where(sw, true_, wk_on)),
            (jnp.where(sw, s_m4, w_m4), jnp.where(sw, true_, wk_on)),
            (jnp.where(sw, s_m5, w_m5),
             jnp.where(sw, true_, wk_on & filter_q)),
            (s_m6, jnp.where(sw, true_, false_)),
        )

        # ---- per-offset outputs O_k / write masks M_k, k = -7..6 ----
        O: dict = {}
        M: dict = {}
        for k in range(-7, 7):
            if k < 0:
                lv, lu = long_side(-1 - k, ref_p, np_cls, n_p, Pv)
            else:
                lv, lu = long_side(k, ref_q, nq_cls, n_q, Qv)
            val = jnp.where(sw_l & lu, lv, A(k))
            wr = sw_l & lu
            if -3 <= k <= 2:
                rv, rw = reg_vals[k + 3]
                use_r = reg_ok & rw
                val = jnp.where(sw_l, val, jnp.where(use_r, rv, A(k)))
                wr = wr | use_r
            O[k] = val
            M[k] = wr & bs_v

        # ---- route edge-position results to written pixels ----
        out = P
        for p in range(4):
            pm = phase_m[p][None, :]
            for r in (p, p + 4, p - 4, p - 8):
                if r < -7 or r > 6:
                    continue
                out = jnp.where(pm & _sh(M[r], r), _sh(O[r], r), out)
        return out.astype(plane.dtype)

    return apply


@functools.lru_cache(maxsize=None)
def deblock_chroma_dense_core(H: int, W: int, bd: int, ctu_c: int,
                              L: int, dir1: bool, fy: int, fx: int,
                              n_sl: int, comp: int):
    """Dense chroma edge filter; edges vertical on 8-grid columns,
    segments of L parallel rows (L = 4/sub along the edge direction).

    apply(plane [H, W] chroma, grid [h4, w4] int16 (luma-cell grid,
    transposed for dir1), si, sltab) -> filtered plane."""
    pel_max = (1 << bd) - 1
    xs = np.arange(W)
    phase_m = [jnp.asarray((xs & 7) == p) for p in range(8)]
    in_pic = jnp.asarray(xs >= 8)[None, :]  # first edge at 8
    hc_col = jnp.asarray((xs % ctu_c) == 0)[None, :]
    line3 = 1 if L == 2 else 3
    oc = 2 if comp == 1 else 4  # sltab column base (tc, beta)

    def E(v):
        return jnp.repeat(jnp.repeat(v, fy, 0), fx, 1)[:H, :W]

    def apply(plane, grid, si, sltab):
        P = plane.astype(jnp.int32)
        pad = jnp.pad(P, ((0, 0), (4, 4)), mode="edge")

        def A(k):
            return pad[:, 4 + k: 4 + k + W]

        g = grid.astype(jnp.int32)
        bs4 = g & 3
        qp4 = (g >> 2) & 127
        lg4 = ((g >> 9) & 1) != 0
        tco4 = _sl_sel(si, sltab, oc, n_sl)
        bto4 = _sl_sel(si, sltab, oc + 1, n_sl)
        idx_tc4 = jnp.clip(qp4 + 2 * (bs4 - 1) + 2 * tco4, 0, 65)
        idx_b4 = jnp.clip(qp4 + 2 * bto4, 0, 63)
        tc4 = _tc_of(idx_tc4, bd)
        beta4 = jnp.asarray(_DB_BETA)[idx_b4] << (bd - 8)
        sel4 = (bs4 == 2) | (lg4 & (bs4 == 1))
        valid4 = sel4 & ~((tc4 == 0) & (~lg4))

        bs_v = E(valid4) & in_pic
        tc = E(tc4)
        beta = E(beta4)
        large = E(lg4)
        tc5 = (tc * 5 + 1) >> 1
        hor_ctb = hc_col if dir1 else jnp.zeros((1, W), dtype=bool)

        m0, m1, m2 = A(-4), A(-3), A(-2)
        m3, m4 = A(-1), A(0)
        m5, m6, m7 = A(1), A(2), A(3)
        absm34 = jnp.abs(m3 - m4)

        dp = jnp.where(hor_ctb, jnp.abs(m3 - m2),
                       jnp.abs(m1 - 2 * m2 + m3))
        dq = jnp.abs(m4 - 2 * m5 + m6)
        d = dp + dq
        sp3 = jnp.where(hor_ctb, jnp.abs(m2 - m3), jnp.abs(m0 - m3))
        sq3 = jnp.abs(m7 - m4)
        cstr = (2 * d < (beta >> 2)) & (absm34 < tc5) \
            & ((sp3 + sq3) < (beta >> 3))
        d0, d3 = _seg(d, 0, L), _seg(d, line3, L)
        sw = large & ((d0 + d3) < beta) & _seg(cstr, 0, L) \
            & _seg(cstr, line3, L)

        def c3(v, ref):
            return jnp.maximum(ref - tc, jnp.minimum(ref + tc, v))

        h_m3 = c3((3 * m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3)
        h_m4 = c3((2 * m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4)
        h_m5 = c3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5)
        h_m6 = c3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6)
        f_m1 = c3((3 * m0 + 2 * m1 + m2 + m3 + m4 + 4) >> 3, m1)
        f_m2 = c3((2 * m0 + m1 + 2 * m2 + m3 + m4 + m5 + 4) >> 3, m2)
        f_m3 = c3((m0 + m1 + m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3, m3)
        f_m4 = c3((m1 + m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3, m4)
        f_m5 = c3((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3, m5)
        f_m6 = c3((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3, m6)
        delta = jnp.clip(((m4 - m3) * 4 + m2 - m5 + 4) >> 3, -tc, tc)
        w_m3 = jnp.clip(m3 + delta, 0, pel_max)
        w_m4 = jnp.clip(m4 - delta, 0, pel_max)

        strong_h = (m1, m2, h_m3, h_m4, h_m5, h_m6)
        strong_f = (f_m1, f_m2, f_m3, f_m4, f_m5, f_m6)
        weak = (m1, m2, w_m3, w_m4, m5, m6)
        write_h = (False, False, True, True, True, True)
        write_f = (True, True, True, True, True, True)
        write_w = (False, False, True, True, False, False)

        O: dict = {}
        M: dict = {}
        false_ = jnp.zeros_like(sw)
        for j, k in enumerate((-3, -2, -1, 0, 1, 2)):
            sv = jnp.where(hor_ctb, strong_h[j], strong_f[j])
            sm = jnp.where(hor_ctb,
                           jnp.full_like(sw, write_h[j]),
                           jnp.full_like(sw, write_f[j]))
            val = jnp.where(sw, sv, weak[j])
            wr = jnp.where(sw, sm,
                           jnp.full_like(sw, write_w[j]) | false_)
            O[k] = val
            M[k] = wr & bs_v

        out = P
        for p in range(8):
            pm = phase_m[p][None, :]
            for r in (p, p - 8):
                if r < -3 or r > 2:
                    continue
                out = jnp.where(pm & _sh(M[r], r), _sh(O[r], r), out)
        return out.astype(plane.dtype)

    return apply
