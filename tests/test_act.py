"""Adaptive colour transform (ACT, 4:4:4) — oracle tests vs the reference
decoder (CABACReader::adaptive_color_transform, DecCu::xIntraRecACT,
QpParam DELTA_QP_ACT), plus the small-CU bi-prediction restriction the
4:4:4 coverage exposed (PU::restrictBiPredMergeCandsOne)."""

import hashlib
import os

import pytest

from tests.test_oracle import VVDECAPP, ref_decode
from vvdec_tpu.decoder import decode_to_yuv
from vvdec_tpu.testenc.encoder import generate_stream

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _check(tmp_path, n_frames=2, **kw):
    stream, _ = generate_stream(n_frames=n_frames, **kw)
    ref = ref_decode(stream, tmp_path, expect_frames=n_frames)
    out = decode_to_yuv(stream)
    assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


S = dict(chroma_format=3, act_enabled=True)


class TestActIntra:
    @pytest.mark.parametrize("seed", range(3))
    def test_basic(self, seed, tmp_path):
        _check(tmp_path, width=64, height=64, seed=seed, sps_kw=dict(S),
               dec_kw=dict(split_prob=0.5, act_prob=0.7))

    @pytest.mark.parametrize("qp", (22, 40))
    def test_qp_offsets(self, qp, tmp_path):
        """DELTA_QP_ACT = (-5, 1, 3, 1) with [0, 63+off] clipping."""
        _check(tmp_path, width=64, height=64, seed=2, qp=qp,
               sps_kw=dict(S), dec_kw=dict(split_prob=0.5, act_prob=0.6))

    def test_with_jccr(self, tmp_path):
        _check(tmp_path, width=64, height=64, seed=3,
               sps_kw=dict(S, joint_cbcr_enabled=True),
               dec_kw=dict(split_prob=0.5, act_prob=0.6, jccr_prob=0.5))

    def test_with_lfnst_mts(self, tmp_path):
        _check(tmp_path, width=64, height=64, seed=4,
               sps_kw=dict(S, lfnst_enabled=True, mts_enabled=True,
                           explicit_mts_intra=True),
               dec_kw=dict(split_prob=0.5, act_prob=0.6))

    def test_with_transform_skip_bdpcm(self, tmp_path):
        """Luma BDPCM allowed under ACT; chroma BDPCM suppressed
        (CU::bdpcmAllowed, UnitTools.cpp:3554)."""
        _check(tmp_path, width=64, height=64, seed=5,
               sps_kw=dict(S, transform_skip_enabled=True,
                           bdpcm_enabled=True),
               dec_kw=dict(split_prob=0.5, act_prob=0.6))

    def test_qp_delta(self, tmp_path):
        _check(tmp_path, width=64, height=64, seed=6,
               sps_kw=dict(S), pps_kw=dict(cu_qp_delta_subdiv=2),
               dec_kw=dict(split_prob=0.5, act_prob=0.6, qp_delta_range=6))


def _act_inter_stream(seed, n, dk, sps_kw=None, qp=32):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import B_SLICE
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(96, 64, chroma_format=3, **(sps_kw or {}))
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    st = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    st += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n):
        dec = RandomDecisions(seed=seed * 100 + f, **dk)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=qp, poc=0, idr=True)
        else:
            nal, _ = E.encode_frame(sps, pps, dec, qp=qp, poc=f, idr=False,
                                    slice_type=B_SLICE,
                                    ref_deltas=((1,), (1,)))
        st += nal
    return st


class TestActInter:
    DK = dict(split_prob=0.5, act_prob=0.6, inter_prob=0.7, skip_prob=0.2,
              mv_range=24, bi_prob=0.5)

    @pytest.mark.parametrize("seed", range(3))
    def test_inter_act(self, seed, tmp_path):
        stream = _act_inter_stream(seed, 4, self.DK,
                                   sps_kw=dict(act_enabled=True))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestSmallCuBiRestriction:
    """4:4:4 inter exposes 4x8/8x4 merge CUs whose bi candidates must drop
    to L0 uni-prediction (PU::restrictBiPredMergeCandsOne)."""

    @pytest.mark.parametrize("seed", range(3))
    def test_444_inter(self, seed, tmp_path):
        dk = dict(split_prob=0.5, inter_prob=0.7, skip_prob=0.2,
                  mv_range=24, bi_prob=0.5)
        stream = _act_inter_stream(seed + 10, 3, dk)
        ref = ref_decode(stream, tmp_path, expect_frames=3)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestFormatsFullToolset:
    """Heavy inter toolset (affine/GPM/MMVD/SMVD/TMVP/SbTMVP/BCW/AMVR/
    DMVR/BDOF/CIIP) across chroma formats, incl. 4:4:4 + ACT — oracle
    bit-exactness vs the reference decoder."""

    TOOLS = dict(affine_enabled=True, affine_6param=True,
                 temporal_mvp_enabled=True, sbtmvp_enabled=True,
                 mmvd_enabled=True, smvd_enabled=True, gpm_enabled=True,
                 max_num_gpm_cand=2, ciip_enabled=True, bcw_enabled=True,
                 amvr_enabled=True, dmvr_enabled=True, bdof_enabled=True)
    DK = dict(split_prob=0.5, inter_prob=0.8, skip_prob=0.15, mv_range=48,
              bi_prob=0.6, affine_prob=0.25, affine_merge_prob=0.3,
              geo_prob=0.2, mmvd_prob=0.2, ciip_prob=0.15, smvd_prob=0.2,
              bcw_prob=0.3, amvr_prob=0.3)

    def _build(self, cf, seed, n, dk, sps_extra):
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.hls.params import B_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)

        sps = E.make_sps(96, 64, chroma_format=cf, **sps_extra)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        st = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        st += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(n):
            dec = RandomDecisions(seed=seed * 100 + f, **dk)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0,
                                        idr=True)
            else:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f,
                                        idr=False, slice_type=B_SLICE,
                                        ref_deltas=((1,), (1,)))
            st += nal
        return st

    @pytest.mark.parametrize("cf", (0, 2, 3))
    def test_format_full_toolset(self, cf, tmp_path):
        stream = self._build(cf, cf, 4, self.DK, dict(self.TOOLS))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    def test_444_act_full_toolset(self, tmp_path):
        stream = self._build(3, 51, 4, dict(self.DK, act_prob=0.4),
                             dict(self.TOOLS, act_enabled=True))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestActScalingLists:
    """Explicit scaling lists under ACT: the colour-space disable gate
    (disableSMForACT, Quant.cpp:306) in both polarities."""

    @pytest.mark.parametrize("alt_disabled,designated", (
        (True, False), (True, True), (False, False)))
    def test_gate(self, alt_disabled, designated, tmp_path):
        from tests.test_scaling_list import _stream

        sps_kw = dict(chroma_format=3, act_enabled=True)
        if alt_disabled:
            sps_kw.update(scaling_matrix_for_alt_cs_disabled=True,
                          scaling_matrix_designated_cs=designated)
        stream = _stream(3, 2, 1, sps_kw,
                         dict(split_prob=0.5, act_prob=0.6), chroma=True)
        ref = ref_decode(stream, tmp_path, expect_frames=2)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    def test_lmcs_act(self, tmp_path):
        """Chroma LMCS residual scaling applies to the converted residual
        (xIntraRecACT order, DecCu.cpp:618-631)."""
        _check(tmp_path, width=64, height=64, seed=7,
               sps_kw=dict(S, lmcs_enabled=True),
               dec_kw=dict(split_prob=0.5, act_prob=0.6))


class TestActWithPartitioningTools:
    """ACT / 4:4:4 combined with WPP and tiles (substream entry points,
    per-tile context resets) — oracle bit-exactness."""

    def test_wpp_444_act(self, tmp_path):
        from tests.test_tiles_wpp import _stream

        stream = _stream(1, 2, 2,
                         dict(entropy_coding_sync_enabled=True,
                              chroma_format=3, act_enabled=True),
                         {}, dict(split_prob=0.5, act_prob=0.5))
        ref = ref_decode(stream, tmp_path, expect_frames=2)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    def test_tiles_444_inter(self, tmp_path):
        from tests.test_tiles_wpp import _stream

        stream = _stream(3, 4, 0,
                         dict(chroma_format=3, temporal_mvp_enabled=True),
                         dict(tile_cols=[2, 1], tile_rows=[1, 1]),
                         dict(split_prob=0.5, inter_prob=0.7,
                              skip_prob=0.2, mv_range=40, bi_prob=0.5))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()
