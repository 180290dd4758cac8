"""Oracle bit-exactness tests for DMVR and BDOF."""

import os

import pytest

from tests.test_affine import _check, _stream

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _sym_deltas(f):
    """Equal-distance past/future refs so eq-dist bi-pred (DMVR/BDOF
    eligibility) actually occurs; frames are coded out of order by the
    caller so only past-POC refs exist in the DPB."""
    return ((1,), (-1,))


class TestBdof:
    @pytest.mark.parametrize("seed", range(4))
    def test_bdof(self, seed, tmp_path):
        # code POCs 0,2 then 1 (ref 0 and 2): frame 1 gets eq-dist bi-pred
        stream = _bpyramid_stream(
            seed, dict(bdof_enabled=True),
            dict(split_prob=0.35, inter_prob=0.8, skip_prob=0.2,
                 mv_range=40, bi_prob=0.8))
        _check(stream, tmp_path, 5)


class TestDmvr:
    @pytest.mark.parametrize("seed", range(4))
    def test_dmvr(self, seed, tmp_path):
        stream = _bpyramid_stream(
            seed, dict(dmvr_enabled=True),
            dict(split_prob=0.35, inter_prob=0.8, skip_prob=0.3,
                 mv_range=40, bi_prob=0.8))
        _check(stream, tmp_path, 5)

    @pytest.mark.parametrize("seed", range(3))
    def test_dmvr_bdof_combined(self, seed, tmp_path):
        stream = _bpyramid_stream(
            seed, dict(dmvr_enabled=True, bdof_enabled=True,
                       temporal_mvp_enabled=True, mmvd_enabled=True,
                       amvr_enabled=True, bcw_enabled=True),
            dict(split_prob=0.4, inter_prob=0.8, skip_prob=0.25,
                 mv_range=40, bi_prob=0.7, mmvd_prob=0.2, amvr_prob=0.3,
                 bcw_prob=0.3))
        _check(stream, tmp_path, 5)

    @pytest.mark.parametrize("seed", range(2))
    def test_dmvr_bdof_affine_sbtmvp(self, seed, tmp_path):
        stream = _bpyramid_stream(
            seed, dict(dmvr_enabled=True, bdof_enabled=True,
                       affine_enabled=True, affine_6param=True,
                       prof_enabled=True, sbtmvp_enabled=True,
                       temporal_mvp_enabled=True),
            dict(split_prob=0.4, inter_prob=0.8, skip_prob=0.25,
                 mv_range=40, bi_prob=0.7, affine_prob=0.3,
                 affine_merge_prob=0.3))
        _check(stream, tmp_path, 5)


def _bpyramid_stream(seed, sps_kw, dec_kw, pps_kw=None):
    """I0, P4(ref 0), then B2(0,4), B1(0,2), B3(2,4): B frames with one
    past and one future reference at equal distance."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import B_SLICE, P_SLICE
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(96, 64, num_reorder_pics=[2], **sps_kw)
    pps = E.make_pps(sps, **(pps_kw or {}))
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())

    # extra RPL entries beyond the active count keep DPB pictures alive
    coding = [
        (0, True, None, ((), ()), None),
        (4, False, P_SLICE, ((4,), ()), None),
        (2, False, B_SLICE, ((2,), (-2,)), [1, 1]),
        (1, False, B_SLICE, ((1, -3), (-1,)), [1, 1]),
        (3, False, B_SLICE, ((1, 3), (-1,)), [1, 1]),
    ]
    for i, (poc, idr, st, deltas, active) in enumerate(coding):
        dec = RandomDecisions(seed=seed * 100 + i, **dec_kw)
        if idr:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=poc, idr=True)
        else:
            sh_kw = dict(num_ref_idx_active=active) if active else None
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=poc, idr=False,
                                    slice_type=st, ref_deltas=deltas,
                                    sh_kw=sh_kw)
        stream += nal
    return stream
