"""Device MC kernel family vs the host golden implementations.

The reference validates its SIMD kernels by randomized equivalence
against scalar code (tests/vvdec_unit_test, InterpolationFilter :1390,
InterPrediction :1990, RdCost :2123); these tests are the same pattern
for the XLA kernels: random refs/blocks/MVs, bit-exact comparison with
frame/inter_np + frame/dmvr_np.
"""

import numpy as np
import pytest


def _mk_ref(rng, H, W, bd):
    return rng.integers(0, 1 << bd, (H, W)).astype(np.int32)


class TestMcBatch:
    @pytest.mark.parametrize("bd", [8, 10])
    @pytest.mark.parametrize("w,h", [(8, 8), (16, 8), (32, 16)])
    def test_luma(self, bd, w, h):
        import jax.numpy as jnp
        from vvdec_tpu.frame.inter_np import mc_block
        from vvdec_tpu.ops.mc_device import (
            mc_batch_core, mc_coeff_rows, pad_ref)
        rng = np.random.default_rng(bd * 100 + w + h)
        H, W = 96, 128
        margin = 88  # ctu 64 + 24
        refs = [_mk_ref(rng, H, W, bd) for _ in range(2)]
        refs_pad = jnp.stack([pad_ref(r, margin) for r in refs])
        N = 24
        taps, half = 8, 3
        xs = rng.integers(0, W - w, N)
        ys = rng.integers(0, H - h, N)
        mvx = rng.integers(-((64 + 8) << 4), ((64 + 8) << 4), N)
        mvy = rng.integers(-((64 + 8) << 4), ((64 + 8) << 4), N)
        ridx = rng.integers(0, 2, N)
        inter = rng.integers(0, 2, N).astype(bool)
        alth = rng.integers(0, 2, N).astype(bool)
        fx = mvx & 15
        fy = mvy & 15
        x0 = xs + (mvx >> 4) - half + margin
        y0 = ys + (mvy >> 4) - half + margin
        cfx = mc_coeff_rows(fx, 0, alt_hpel=alth)
        cfy = mc_coeff_rows(fy, 0, alt_hpel=alth)
        fn = mc_batch_core(w, h, taps, bd, H + 2 * margin, W + 2 * margin,
                           2)
        out = np.asarray(fn(refs_pad, jnp.asarray(y0.astype(np.int32)),
                            jnp.asarray(x0.astype(np.int32)),
                            jnp.asarray(ridx.astype(np.int32)),
                            jnp.asarray(cfy), jnp.asarray(cfx),
                            jnp.asarray(inter)))
        for n in range(N):
            gold = mc_block(refs[ridx[n]], int(xs[n]), int(ys[n]), w, h,
                            (int(mvx[n]), int(mvy[n])), 0, bd, (2, 2),
                            bool(inter[n]), alt_hpel=bool(alth[n]))
            assert np.array_equal(out[n], gold), n

    @pytest.mark.parametrize("sub", [(2, 2), (1, 1)])
    def test_chroma(self, sub):
        import jax.numpy as jnp
        from vvdec_tpu.frame.inter_np import mc_block
        from vvdec_tpu.ops.mc_device import (
            mc_batch_core, mc_coeff_rows, pad_ref)
        bd, w, h = 10, 8, 8
        rng = np.random.default_rng(17 + sub[0])
        H, W = 64, 96
        margin = 72
        ref = _mk_ref(rng, H, W, bd)
        refs_pad = pad_ref(ref, margin)[None]
        N = 16
        taps, half = 4, 1
        fb = 4 + (sub[0] - 1)
        xs = rng.integers(0, W - w, N)
        ys = rng.integers(0, H - h, N)
        mvx = rng.integers(-(40 << fb), 40 << fb, N)
        mvy = rng.integers(-(40 << fb), 40 << fb, N)
        inter = rng.integers(0, 2, N).astype(bool)
        fx = (mvx & ((1 << fb) - 1)) << (5 - fb)
        fy = (mvy & ((1 << fb) - 1)) << (5 - fb)
        x0 = xs + (mvx >> fb) - half + margin
        y0 = ys + (mvy >> fb) - half + margin
        cfx = mc_coeff_rows(fx, 1)
        cfy = mc_coeff_rows(fy, 1)
        fn = mc_batch_core(w, h, taps, bd, H + 2 * margin,
                           W + 2 * margin, 1)
        out = np.asarray(fn(refs_pad, jnp.asarray(y0.astype(np.int32)),
                            jnp.asarray(x0.astype(np.int32)),
                            jnp.zeros(N, jnp.int32),
                            jnp.asarray(cfy), jnp.asarray(cfx),
                            jnp.asarray(inter)))
        for n in range(N):
            gold = mc_block(ref, int(xs[n]), int(ys[n]), w, h,
                            (int(mvx[n]), int(mvy[n])), 1, bd, sub,
                            bool(inter[n]))
            assert np.array_equal(out[n], gold), n


class TestBiCombine:
    @pytest.mark.parametrize("bd", [8, 10])
    def test_avg_and_bcw(self, bd):
        import jax.numpy as jnp
        from vvdec_tpu.frame.inter_np import (
            BCW_INTERN, BCW_WEIGHTS, bi_average, bi_weighted)
        from vvdec_tpu.ops.mc_device import bi_combine_core
        rng = np.random.default_rng(3)
        N, h, w = 12, 16, 16
        a = rng.integers(-9000, 9000, (N, h, w)).astype(np.int32)
        b = rng.integers(-9000, 9000, (N, h, w)).astype(np.int32)
        bcw_fwd = rng.integers(0, 5, N)
        w1 = np.array([BCW_WEIGHTS[BCW_INTERN[f]] for f in bcw_fwd],
                      dtype=np.int32)
        fn = bi_combine_core(w, h, bd)
        out = np.asarray(fn(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(w1)))
        for n in range(N):
            if w1[n] == 4:
                gold = bi_average(a[n].astype(np.int64),
                                  b[n].astype(np.int64), bd)
            else:
                gold = bi_weighted(a[n].astype(np.int64),
                                   b[n].astype(np.int64), bd,
                                   int(bcw_fwd[n]))
            assert np.array_equal(out[n], gold), n


class TestDmvrSad:
    def test_sad25(self):
        import jax.numpy as jnp
        from vvdec_tpu.frame.dmvr_np import _sad_sub2
        from vvdec_tpu.ops.mc_device import _DMVR_OFFS, dmvr_sad25_core
        rng = np.random.default_rng(4)
        N, dx, dy = 9, 16, 16
        bl0 = rng.integers(0, 1024, (N, dy + 4, dx + 4)).astype(np.int32)
        bl1 = rng.integers(0, 1024, (N, dy + 4, dx + 4)).astype(np.int32)
        fn = dmvr_sad25_core(dx, dy)
        out = np.asarray(fn(jnp.asarray(bl0), jnp.asarray(bl1)))
        for n in range(N):
            for j, (hor, ver) in enumerate(_DMVR_OFFS):
                a = bl0[n, 2 + ver:2 + ver + dy, 2 + hor:2 + hor + dx]
                b = bl1[n, 2 - ver:2 - ver + dy, 2 - hor:2 - hor + dx]
                assert out[n, j] == _sad_sub2(a, b), (n, hor, ver)


class TestBdof:
    @pytest.mark.parametrize("w,h", [(8, 8), (16, 16), (16, 8)])
    def test_blend(self, w, h):
        import jax.numpy as jnp
        from vvdec_tpu.frame.dmvr_np import bdof_blend
        from vvdec_tpu.ops.mc_device import bdof_blend_core
        bd = 10
        rng = np.random.default_rng(w * h)
        N = 8
        ext0 = rng.integers(-8192, 8176, (N, h + 2, w + 2)) \
            .astype(np.int32)
        ext1 = rng.integers(-8192, 8176, (N, h + 2, w + 2)) \
            .astype(np.int32)
        fn = bdof_blend_core(w, h, bd)
        out = np.asarray(fn(jnp.asarray(ext0), jnp.asarray(ext1)))
        for n in range(N):
            gold = bdof_blend(ext0[n].astype(np.int64),
                              ext1[n].astype(np.int64), w, h, bd)
            assert np.array_equal(out[n], gold), n


class TestMcFrame:
    def test_frame_preds_match_host(self, monkeypatch):
        """mc_frame_device on real decoded pictures: every eligible CU's
        device prediction equals the host per-CU prediction."""
        monkeypatch.setenv("VVDEC_TPU_NO_NATIVE_INTER", "1")
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.hls.params import B_SLICE, P_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)
        from vvdec_tpu.decoder import StreamDecoder

        sps = E.make_sps(128, 96, ctu=64, num_reorder_pics=[2],
                         amvr_enabled=True, bcw_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter(); write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter(); write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        coding = [
            (0, True, None, ((), ()), None),
            (4, False, P_SLICE, ((4,), ()), None),
            (2, False, B_SLICE, ((2,), (-2,)), [1, 1]),
        ]
        for i, (poc, idr, st, deltas, active) in enumerate(coding):
            dec_kw = dict(split_prob=0.4, inter_prob=0.85, skip_prob=0.2,
                          mv_range=48, bi_prob=0.6, amvr_prob=0.3,
                          bcw_prob=0.4)
            d = RandomDecisions(seed=100 + i, **dec_kw)
            if idr:
                nal, _ = E.encode_frame(sps, pps, d, qp=32, poc=poc,
                                        idr=True)
            else:
                sh_kw = dict(num_ref_idx_active=active) if active else None
                nal, _ = E.encode_frame(sps, pps, d, qp=32, poc=poc,
                                        idr=False, slice_type=st,
                                        ref_deltas=deltas, sh_kw=sh_kw)
            stream += nal

        css = []
        orig = StreamDecoder._reconstruct_inner

        def spy(self, f):
            orig(self, f)
            css.append(f.cs)

        monkeypatch.setattr(StreamDecoder, "_reconstruct_inner", spy)
        dec = StreamDecoder()
        dec.push(stream)
        dec.flush()

        from vvdec_tpu.frame import inter_np as I
        from vvdec_tpu.ops.mc_device import _cu_mc_eligible, \
            mc_frame_device
        checked = bi_seen = 0
        for cs in css:
            if cs.sh.is_intra:
                continue
            preds = mc_frame_device(cs)
            for cu in cs.cus:
                if cu is None or not _cu_mc_eligible(cs, cu):
                    continue
                assert cu.idx in preds
                parts = []
                bi = cu.inter_dir == 3
                for lst in (0, 1):
                    if not (cu.inter_dir & (1 << lst)):
                        continue
                    mvc = I.clip_mv(tuple(cu.mv[lst]), cu.x, cu.y, cs,
                                    size=(cu.w, cu.h))
                    planes = cs.ref_planes[lst][cu.ref_idx[lst]]
                    part = [I.mc_block(planes[0], cu.x, cu.y, cu.w, cu.h,
                                       mvc, 0, cs.sps.bit_depth,
                                       (cs.sub_w, cs.sub_h), bi,
                                       alt_hpel=cu.alt_hpel)]
                    for comp in (1, 2):
                        part.append(I.mc_block(
                            planes[comp], cu.cx, cu.cy, cu.cw, cu.ch,
                            mvc, comp, cs.sps.bit_depth,
                            (cs.sub_w, cs.sub_h), bi))
                    parts.append(part)
                for comp in range(3):
                    if bi:
                        if cu.bcw_idx:
                            gold = I.bi_weighted(parts[0][comp],
                                                 parts[1][comp],
                                                 cs.sps.bit_depth,
                                                 cu.bcw_idx)
                        else:
                            gold = I.bi_average(parts[0][comp],
                                                parts[1][comp],
                                                cs.sps.bit_depth)
                    else:
                        gold = parts[0][comp]
                    assert np.array_equal(preds[cu.idx][comp], gold), \
                        (cu.idx, comp)
                checked += 1
                bi_seen += int(bi)
        assert checked >= 8, checked
        assert bi_seen >= 1, bi_seen


class TestMcFrameWeighted:
    def test_weighted_preds_match_host(self, monkeypatch):
        """Explicit weighted prediction (P and B) through the device MC
        path vs the host _apply_wp."""
        monkeypatch.setenv("VVDEC_TPU_NO_NATIVE_INTER", "1")
        import sys
        sys.path.insert(0, "tests")
        from test_weighted_pred import _wp_stream
        from vvdec_tpu.decoder import StreamDecoder
        stream = _wp_stream(3, 3, 0, {}, dict(weighted_bipred=True,
                                              weighted_pred=True),
                            dict(split_prob=0.4, inter_prob=0.85,
                                 skip_prob=0.2, mv_range=32, bi_prob=0.5))
        css = []
        orig = StreamDecoder._reconstruct_inner

        def spy(self, f):
            orig(self, f)
            css.append(f.cs)

        monkeypatch.setattr(StreamDecoder, "_reconstruct_inner", spy)
        dec = StreamDecoder()
        dec.push(stream)
        dec.flush()

        import numpy as np
        from vvdec_tpu.frame import inter_np as I
        from vvdec_tpu.frame.dmvr_np import _wp_present
        from vvdec_tpu.hls.weight_table import resolve_wp
        from vvdec_tpu.ops.mc_device import _cu_mc_eligible, \
            mc_frame_device
        checked = 0
        for cs in css:
            if cs.sh.is_intra:
                continue
            preds = mc_frame_device(cs)
            bd = cs.sps.bit_depth
            pel_max = (1 << bd) - 1
            offs = 1 << 13
            sn = max(2, 14 - bd)
            for cu in cs.cus:
                if cu is None or not _cu_mc_eligible(cs, cu) \
                        or not _wp_present(cs, cu):
                    continue
                assert cu.idx in preds
                wt = cs.sh_of(cu).weight_table
                bi = cu.inter_dir == 3
                parts = []
                for lst in (0, 1):
                    if not (cu.inter_dir & (1 << lst)):
                        continue
                    mvc = I.clip_mv(tuple(cu.mv[lst]), cu.x, cu.y, cs,
                                    size=(cu.w, cu.h))
                    pl = cs.ref_planes[lst][cu.ref_idx[lst]]
                    part = [I.mc_block(pl[0], cu.x, cu.y, cu.w, cu.h,
                                       mvc, 0, bd, (cs.sub_w, cs.sub_h),
                                       True, alt_hpel=cu.alt_hpel)]
                    for comp in (1, 2):
                        part.append(I.mc_block(
                            pl[comp], cu.cx, cu.cy, cu.cw, cu.ch, mvc,
                            comp, bd, (cs.sub_w, cs.sub_h), True))
                    parts.append(part)
                for comp in range(3):
                    if bi:
                        wp0 = resolve_wp(wt, 0, cu.ref_idx[0], bd, 3)
                        wp1 = resolve_wp(wt, 1, cu.ref_idx[1], bd, 3)
                        sh_ = wp0[comp]["denom"] + 1 + sn
                        rnd = (1 << sh_) >> 1
                        off = wp0[comp]["o"] + wp1[comp]["o"]
                        v = (wp0[comp]["w"] * (parts[0][comp] + offs)
                             + wp1[comp]["w"] * (parts[1][comp] + offs)
                             + rnd + (off << (sh_ - 1))) >> sh_
                    else:
                        lst = 0 if cu.inter_dir == 1 else 1
                        wp = resolve_wp(wt, lst, cu.ref_idx[lst], bd, 3)
                        sh_ = wp[comp]["denom"] + sn
                        rnd = (1 << sh_) >> 1 if sh_ > 0 else 0
                        v = ((wp[comp]["w"] * (parts[0][comp] + offs)
                              + rnd) >> sh_) + wp[comp]["o"]
                    gold = np.clip(v, 0, pel_max)
                    assert np.array_equal(preds[cu.idx][comp], gold), \
                        (cu.idx, comp)
                checked += 1
        assert checked >= 3, checked
