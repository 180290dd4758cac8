"""Full device reconstruction pipeline (ops/frame_device.py): ITX +
intra chain + in-loop filters run device-resident; every test checks
bit-exactness against the host golden decode, and the fallback census
when a tool outside the device set must route the frame to the host."""

import numpy as np
import pytest

from vvdec_tpu.testenc.encoder import generate_stream

WH = (128, 96)  # shared size: the intra-scan program compiles once


def _assert_both(stream):
    from vvdec_tpu.decoder import decode_annexb
    host = decode_annexb(stream)
    dev = decode_annexb(stream, use_jax=True)
    assert len(host) == len(dev)
    for fh, fd in zip(host, dev):
        for ph, pd in zip(fh, fd):
            assert np.array_equal(np.asarray(ph), np.asarray(pd))


def _census(stream):
    from vvdec_tpu.api import Decoder, DecoderParams
    d = Decoder(DecoderParams(use_device_pipeline=True))
    frames = d.decode(stream)
    frames += d.flush()
    return d.get_fallback_census(), frames


class TestFrameDevice:
    def test_all_intra_basic(self):
        s, _ = generate_stream(width=WH[0], height=WH[1], ctu=32,
                               n_frames=3, seed=5, qp=30,
                               dec_kw=dict(split_prob=0.5, density=0.3))
        _assert_both(s)

    def test_runs_on_device(self):
        """The eligible stream takes the full device path (no
        device_recon fallback counted)."""
        s, _ = generate_stream(width=WH[0], height=WH[1], ctu=32,
                               n_frames=2, seed=6, qp=30)
        census, frames = _census(s)
        assert len(frames) == 2
        assert not any(k.startswith("device_recon") for k in census)

    def test_lfnst_mts(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=7, qp=28,
            sps_kw=dict(lfnst_enabled=True, mts_enabled=True,
                        explicit_mts_intra=True),
            dec_kw=dict(split_prob=0.5, density=0.4))
        _assert_both(s)

    def test_dep_quant_off_high_density(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=8, qp=24,
            dec_kw=dict(split_prob=0.6, density=0.7, max_level=200))
        _assert_both(s)

    def test_dual_tree(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=9, qp=30,
            sps_kw=dict(dual_tree_intra=True, min_qt_size=[8, 8, 8],
                        max_mtt_depth=[2, 2, 2], max_bt_size=[32, 32, 32],
                        max_tt_size=[32, 32, 32]),
            dec_kw=dict(split_prob=0.5, density=0.3))
        _assert_both(s)

    def test_wpp_availability(self):
        # WPP widens the above-right availability rule (getCURestricted)
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=10, qp=30,
            sps_kw=dict(entropy_coding_sync=True),
            dec_kw=dict(split_prob=0.4, density=0.3))
        _assert_both(s)

    def test_chroma_444(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=11, qp=30,
            sps_kw=dict(chroma_format=3),
            dec_kw=dict(split_prob=0.4, density=0.3))
        _assert_both(s)

    def test_sao_alf_configs_still_exact(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=12, qp=30,
            sps_kw=dict(sao_enabled=True),
            sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
            dec_kw=dict(split_prob=0.4, density=0.3, sao_prob=0.6))
        _assert_both(s)

    def test_mip_on_device(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=13, qp=30,
            sps_kw=dict(mip_enabled=True),
            dec_kw=dict(split_prob=0.4, density=0.3, mip_prob=0.9))
        census, _ = _census(s)
        assert not any(k.startswith("device_recon:") for k in census), \
            census
        _assert_both(s)

    def test_mip_large_blocks_on_device(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=64, n_frames=2, seed=17, qp=30,
            sps_kw=dict(mip_enabled=True),
            dec_kw=dict(split_prob=0.15, density=0.3, mip_prob=1.0))
        _assert_both(s)

    def test_cclm_on_device(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=51, qp=30,
            sps_kw=dict(cclm_enabled=True),
            dec_kw=dict(split_prob=0.4, density=0.3))
        census, _ = _census(s)
        assert not any(k.startswith("device_recon:") for k in census), \
            census
        _assert_both(s)

    def test_cclm_dual_tree_422(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=53, qp=30,
            sps_kw=dict(chroma_format=2, cclm_enabled=True,
                        dual_tree_intra=True, min_qt_size=[8, 8, 8],
                        max_mtt_depth=[2, 2, 2], max_bt_size=[32, 32, 32],
                        max_tt_size=[32, 32, 32]),
            dec_kw=dict(split_prob=0.4, density=0.3))
        _assert_both(s)

    def test_isp_falls_back_bit_exact(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=18, qp=30,
            sps_kw=dict(isp_enabled=True),
            dec_kw=dict(split_prob=0.4, density=0.3, isp_prob=0.8))
        census, _ = _census(s)
        assert any(k.startswith("device_recon:") for k in census), census
        _assert_both(s)

    def test_transform_skip_on_device(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=14, qp=30,
            sps_kw=dict(transform_skip_enabled=True),
            dec_kw=dict(split_prob=0.4, density=0.4))
        census, frames = _census(s)
        assert len(frames) == 2
        assert not any(k.startswith("device_recon") for k in census)
        _assert_both(s)


def _ld_stream(n, seed, dec_kw, sps_kw=None, pps_kw=None, sh_kw_fn=None):
    """IDR + low-delay P/B chain (refs: prev, prev2)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import P_SLICE
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(WH[0], WH[1], ctu=32, num_reorder_pics=[0],
                     **(sps_kw or {}))
    pps = E.make_pps(sps, **(pps_kw or {}))
    bw = BitWriter()
    write_sps(bw, sps)
    st = make_nal(NalUnitType.SPS, bw.bytes())
    bw = BitWriter()
    write_pps(bw, pps, sps)
    st += make_nal(NalUnitType.PPS, bw.bytes())
    for f in range(n):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        sh_kw = sh_kw_fn(f) if sh_kw_fn else None
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True,
                                    sh_kw=sh_kw)
        else:
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=P_SLICE,
                ref_deltas=((1, 2) if f >= 2 else (1,), ()), sh_kw=sh_kw)
        st += nal
    return st


class TestFrameDeviceInter:
    IKW = dict(split_prob=0.4, inter_prob=0.8, skip_prob=0.3,
               mv_range=24)

    def test_inter_ld_basic_on_device(self):
        s = _ld_stream(6, 31, self.IKW)
        census, frames = _census(s)
        assert len(frames) == 6
        assert not any(k.startswith("device_recon") for k in census), \
            census
        _assert_both(s)

    def test_inter_bi_bcw(self):
        s = _ld_stream(5, 32, dict(self.IKW, bi_prob=0.5, bcw_prob=0.5),
                       sps_kw=dict(bcw_enabled=True))
        _assert_both(s)

    def test_inter_mmvd_smvd_amvr(self):
        s = _ld_stream(5, 33, dict(self.IKW, mmvd_prob=0.3, amvr_prob=0.4),
                       sps_kw=dict(mmvd_enabled=True, amvr_enabled=True))
        _assert_both(s)

    def test_inter_weighted_pred(self):
        from vvdec_tpu.testenc.encoder import make_weight_table

        def sh_kw(f):
            if f == 0:
                return None
            return dict(weight_table=make_weight_table(33 + f, 2, 0))

        s = _ld_stream(4, 34, self.IKW,
                       sps_kw=dict(weighted_pred=True),
                       pps_kw=dict(weighted_pred=True), sh_kw_fn=sh_kw)
        _assert_both(s)

    def test_inter_sbt_residuals(self):
        s = _ld_stream(4, 35, dict(self.IKW, sbt_prob=0.5),
                       sps_kw=dict(sbt_enabled=True))
        _assert_both(s)

    def test_affine_prof_on_device(self):
        s = _ld_stream(5, 36,
                       dict(self.IKW, affine_prob=0.5,
                            affine_merge_prob=0.5, bi_prob=0.3),
                       sps_kw=dict(affine_enabled=True,
                                   prof_enabled=True))
        census, _ = _census(s)
        assert not any(k.startswith("device_recon:") for k in census), \
            census
        _assert_both(s)

    def test_gpm_on_device(self):
        s = _ld_stream(5, 37, dict(self.IKW, geo_prob=0.5, bi_prob=0.3),
                       sps_kw=dict(geo_enabled=True))
        _assert_both(s)

    def test_sbtmvp_on_device(self):
        s = _ld_stream(5, 38,
                       dict(self.IKW, affine_merge_prob=0.6, bi_prob=0.3),
                       sps_kw=dict(affine_enabled=True,
                                   sbtmvp_enabled=True,
                                   temporal_mvp_enabled=True))
        _assert_both(s)

    def test_ciip_on_device(self):
        s = _ld_stream(5, 39, dict(self.IKW, ciip_prob=0.5, bi_prob=0.3),
                       sps_kw=dict(ciip_enabled=True))
        _assert_both(s)

    def test_mixed_tools_on_device(self):
        s = _ld_stream(5, 40,
                       dict(self.IKW, ciip_prob=0.2, geo_prob=0.2,
                            affine_prob=0.3, bi_prob=0.3, bcw_prob=0.3,
                            mmvd_prob=0.2),
                       sps_kw=dict(ciip_enabled=True, geo_enabled=True,
                                   affine_enabled=True, prof_enabled=True,
                                   bcw_enabled=True, mmvd_enabled=True))
        _assert_both(s)

    def test_dmvr_falls_back_bit_exact(self):
        from vvdec_tpu.hls.params import B_SLICE
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)
        sps = E.make_sps(WH[0], WH[1], ctu=32, num_reorder_pics=[1],
                         dmvr_enabled=True)
        pps = E.make_pps(sps)
        bw = BitWriter()
        write_sps(bw, sps)
        st = make_nal(NalUnitType.SPS, bw.bytes())
        bw = BitWriter()
        write_pps(bw, pps, sps)
        st += make_nal(NalUnitType.PPS, bw.bytes())
        dec = RandomDecisions(seed=41, split_prob=0.2)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
        st += nal
        dec = RandomDecisions(seed=42, split_prob=0.2)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=2, idr=False,
                                slice_type=1, ref_deltas=((2,), ()))
        st += nal
        # eq-dist bi-pred -> DMVR-eligible CUs -> whole-frame fallback
        dec = RandomDecisions(seed=43, split_prob=0.2, inter_prob=0.9,
                              bi_prob=0.9, mv_range=24)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=1, idr=False,
                                slice_type=B_SLICE,
                                ref_deltas=((1,), (-1,)))
        st += nal
        _assert_both(st)


class TestIntraDescriptors:
    def test_plan_reports_reason(self):
        from vvdec_tpu.decoder import parse_annexb
        from vvdec_tpu.ops.frame_device import plan_frame_device
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=1, seed=15, qp=30,
            sps_kw=dict(isp_enabled=True),
            dec_kw=dict(isp_prob=1.0, split_prob=0.2))
        frames = parse_annexb(s)
        desc, reason = plan_frame_device(frames[0].cs)
        assert desc is None and reason == "isp"

    def test_descriptor_rows_cover_all_units(self):
        from vvdec_tpu.decoder import parse_annexb
        from vvdec_tpu.ops.frame_device import plan_frame_device
        s, css = generate_stream(width=WH[0], height=WH[1], ctu=32,
                                 n_frames=1, seed=16, qp=30)
        frames = parse_annexb(s)
        cs = frames[0].cs
        desc, reason = plan_frame_device(cs)
        assert reason is None
        n_units = 0
        for tu in cs.tus:
            cu = cs.cus[tu.cu_idx]
            if tu.blocks[0] is not None and cu.has_luma:
                n_units += 1
            if tu.blocks[1] is not None and cu.has_chroma \
                    and cs.num_comp > 1:
                n_units += 2
        assert desc.shape[0] == n_units


class TestFrameDeviceLmcs:
    """LMCS on the device pipeline: luma reconstructs in the reshaped
    domain, chroma residuals scale by the on-device VPDU-neighbor
    average, and the RSP stage inverse-maps luma before the filters
    (Reshape.cpp:377; frame/lmcs_np.py is the host golden)."""

    def _stream(self, seed, chroma_scale, dec_kw=None):
        from tests.test_lmcs import _lmcs_stream
        return _lmcs_stream(seed, 2, 2, {},
                            dec_kw or dict(split_prob=0.5, density=0.4),
                            chroma_scale, ctu=32, wh=WH)

    @pytest.mark.parametrize("seed", [31, 32])
    def test_lmcs_intra_on_device(self, seed):
        census, frames = _census(self._stream(seed, chroma_scale=False))
        assert len(frames) == 2
        assert not any(k.startswith("device_recon") for k in census)
        _assert_both(self._stream(seed, chroma_scale=False))

    @pytest.mark.parametrize("seed", [33, 34])
    def test_lmcs_chroma_scaling_on_device(self, seed):
        census, frames = _census(self._stream(seed, chroma_scale=True))
        assert not any(k.startswith("device_recon") for k in census)
        _assert_both(self._stream(seed, chroma_scale=True))

    def test_lmcs_inter_falls_back_bit_exact(self):
        from tests.test_lmcs import _lmcs_stream
        s = _lmcs_stream(35, 3, 0, {}, dict(split_prob=0.5, density=0.3,
                                            inter_prob=0.8),
                         True, ctu=32, wh=WH)
        census, _ = _census(s)
        assert census.get("device_recon:lmcs_inter", 0) >= 1
        _assert_both(s)


class TestJccrDevice:
    """Joint Cb-Cr runs in the device ITX stage (the ICT derivation
    post-pass, frame_device._jccr_fn) instead of ejecting the frame."""

    def test_jccr_both_signs(self):
        for seed in (0, 1):
            s, _ = generate_stream(
                width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=seed,
                qp=30, sps_kw=dict(joint_cbcr_enabled=True),
                ph_kw=dict(joint_cbcr_sign=bool(seed % 2)),
                dec_kw=dict(split_prob=0.5, jccr_prob=0.6, density=0.4))
            _assert_both(s)

    def test_jccr_stays_on_device(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=2, qp=30,
            sps_kw=dict(joint_cbcr_enabled=True),
            dec_kw=dict(split_prob=0.5, jccr_prob=0.7, density=0.4))
        census, frames = _census(s)
        assert len(frames) == 2
        assert not any(k.startswith("device_recon") for k in census), \
            census

    def test_jccr_with_lmcs(self):
        # joint Cb-Cr + intra LMCS chroma residual scaling: the derived
        # plane must be ICT-transformed BEFORE the per-unit scale
        from tests.test_lmcs import _lmcs_stream
        s = _lmcs_stream(
            3, 2, 2, dict(joint_cbcr_enabled=True),
            dict(split_prob=0.5, jccr_prob=0.5, density=0.4),
            chroma_scale=True)
        _assert_both(s)
