"""Oracle bit-exactness tests for horizontal reference wraparound (360)."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream(seed, n_frames, slice_type, sps_kw, dec_kw, wrap_minus=0,
            wh=(96, 64)):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=32, ref_wraparound_enabled=True,
                     **sps_kw)
    pps = E.make_pps(sps, ref_wraparound_enabled=True,
                     pic_width_minus_wraparound_offset=wrap_minus)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestWraparound:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 0), (2, 1)])
    def test_wrap_basic(self, seed, st, tmp_path):
        # large MVs so fetches cross the left/right edges
        stream = _stream(
            seed, 4, st, dict(temporal_mvp_enabled=True),
            dict(split_prob=0.4, inter_prob=0.8, skip_prob=0.1,
                 mv_range=120, bi_prob=0.5))
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("wrap_minus", [4, 8])
    def test_wrap_offset(self, wrap_minus, tmp_path):
        stream = _stream(
            3, 3, 1, {}, dict(split_prob=0.4, inter_prob=0.8,
                              skip_prob=0.1, mv_range=120),
            wrap_minus=wrap_minus)
        _check(stream, tmp_path, 3)

    def test_wrap_affine_prof(self, tmp_path):
        stream = _stream(
            4, 3, 1,
            dict(affine_enabled=True, affine_6param=True, prof_enabled=True),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.1,
                 mv_range=100, affine_prob=0.6, aff_mv_range=48))
        _check(stream, tmp_path, 3)

    def test_wrap_dmvr_bdof(self, tmp_path):
        from tests.test_dmvr_bdof import _bpyramid_stream
        # reuse the B-pyramid generator with wraparound enabled
        stream = _bpyramid_stream(
            5, sps_kw=dict(dmvr_enabled=True, bdof_enabled=True,
                           ref_wraparound_enabled=True),
            pps_kw=dict(ref_wraparound_enabled=True,
                        pic_width_minus_wraparound_offset=0),
            dec_kw=dict(split_prob=0.3, inter_prob=0.9, skip_prob=0.3,
                        mv_range=100, bi_prob=0.9))
        _check(stream, tmp_path, 5)
