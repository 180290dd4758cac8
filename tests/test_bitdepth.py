"""Oracle bit-exactness tests for 8-bit streams."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream(seed, n_frames, slice_type, sps_kw, dec_kw, wh=(64, 64)):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=32, bit_depth=8, **sps_kw)
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
            nal, _ = E.encode_frame(sps, pps, dec, qp=30, poc=f, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=30, poc=f, idr=False,
                slice_type=slice_type,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestBitDepth8:
    @pytest.mark.parametrize("seed", range(3))
    def test_intra_8bit(self, seed, tmp_path):
        stream = _stream(seed, 2, 2, {},
                         dict(split_prob=0.5, isp_prob=0.2, mip_prob=0.2,
                              mrl_prob=0.2))
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 0)])
    def test_inter_8bit(self, seed, st, tmp_path):
        stream = _stream(
            seed, 4, st, dict(temporal_mvp_enabled=True, amvr_enabled=True,
                              mmvd_enabled=True),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=24, bi_prob=0.5, mmvd_prob=0.2, amvr_prob=0.2))
        _check(stream, tmp_path, 4)

    def test_8bit_transforms(self, tmp_path):
        from vvdec_tpu.testenc.encoder import RandomDecisions

        class TDec(RandomDecisions):
            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.3

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

            def bdpcm_mode(self, cu, ch):
                return self.rnd.choice([0, 0, 1, 2])

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import make_nal
        from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

        sps = E.make_sps(64, 64, ctu=32, bit_depth=8,
                         transform_skip_enabled=True, bdpcm_enabled=True,
                         log2_max_ts_size=4, lfnst_enabled=True,
                         mts_enabled=True, explicit_mts_intra=True,
                         dep_quant_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(2):
            dec = TDec(seed=f, split_prob=0.5)
            nal, _ = E.encode_frame(sps, pps, dec, qp=30, poc=f, idr=True)
            stream += nal
        _check(stream, tmp_path, 2)
