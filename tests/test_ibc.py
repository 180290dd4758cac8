"""Oracle bit-exactness tests for IBC (intra block copy)."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _ibc_stream(seed, n_frames, slice_type, sps_kw, dec_kw, ctu=32,
                wh=(96, 64)):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=ctu, ibc_enabled=True, **sps_kw)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0 or slice_type == 2:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestIbcIntra:
    @pytest.mark.parametrize("seed", range(4))
    def test_ibc_intra_slices(self, seed, tmp_path):
        stream = _ibc_stream(seed, 2, 2, {},
                             dict(split_prob=0.5, ibc_prob=0.7))
        _check(stream, tmp_path, 2)

    def test_ibc_max_merge_cand_1(self, tmp_path):
        stream = _ibc_stream(7, 2, 2, dict(max_num_ibc_merge_cand=1),
                             dict(split_prob=0.5, ibc_prob=0.7))
        _check(stream, tmp_path, 2)

    def test_ibc_ctu64(self, tmp_path):
        stream = _ibc_stream(9, 2, 2, {}, dict(split_prob=0.5, ibc_prob=0.7),
                             ctu=64, wh=(128, 64))
        _check(stream, tmp_path, 2)


class TestIbcInter:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 0)])
    def test_ibc_in_inter_slices(self, seed, st, tmp_path):
        stream = _ibc_stream(
            seed, 4, st, dict(temporal_mvp_enabled=True),
            dict(split_prob=0.4, inter_prob=0.6, skip_prob=0.15,
                 mv_range=40, bi_prob=0.5, ibc_prob=0.5))
        _check(stream, tmp_path, 4)
