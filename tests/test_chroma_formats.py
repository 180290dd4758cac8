"""Oracle bit-exactness tests for 4:0:0 / 4:2:2 / 4:4:4 chroma formats."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream(cf, seed, n_frames, slice_type, sps_kw, dec_kw, wh=(64, 64),
            dec_cls=None, qp=32):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=32, chroma_format=cf, **sps_kw)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    cls = dec_cls or RandomDecisions
    for f in range(n_frames):
        dec = cls(seed=seed * 100 + f, **dec_kw)
        if f == 0 or slice_type == 2:
            nal, _ = E.encode_frame(sps, pps, dec, qp=qp, poc=f, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=qp, poc=f, idr=False,
                slice_type=slice_type,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestMonochrome:
    @pytest.mark.parametrize("seed", range(2))
    def test_400_intra(self, seed, tmp_path):
        stream = _stream(0, seed, 2, 2, {},
                         dict(split_prob=0.5, isp_prob=0.2, mip_prob=0.2))
        _check(stream, tmp_path, 2)

    def test_400_inter(self, tmp_path):
        stream = _stream(0, 1, 4, 1, dict(temporal_mvp_enabled=True),
                         dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                              mv_range=24))
        _check(stream, tmp_path, 4)


class TestChroma422:
    @pytest.mark.parametrize("seed", range(2))
    def test_422_intra(self, seed, tmp_path):
        stream = _stream(2, seed, 2, 2, {},
                         dict(split_prob=0.5, isp_prob=0.2, mip_prob=0.2,
                              jccr_prob=0.3))
        _check(stream, tmp_path, 2)

    def test_422_cclm(self, tmp_path):
        stream = _stream(2, 3, 2, 2, dict(cclm_enabled=True),
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    def test_422_dual_tree(self, tmp_path):
        stream = _stream(2, 4, 2, 2,
                         dict(dual_tree_intra=True, cclm_enabled=True,
                              min_qt_size=[8, 8, 8], max_mtt_depth=[2, 2, 2],
                              max_bt_size=[32, 32, 32],
                              max_tt_size=[32, 32, 32]),
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("st", [0, 1])
    def test_422_inter(self, st, tmp_path):
        stream = _stream(2, 5 + st, 4, st, dict(temporal_mvp_enabled=True),
                         dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                              mv_range=24, bi_prob=0.5))
        _check(stream, tmp_path, 4)

    def test_422_transforms(self, tmp_path):
        from vvdec_tpu.testenc.encoder import RandomDecisions

        class TDec(RandomDecisions):
            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.3

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

            def bdpcm_mode(self, cu, ch):
                return self.rnd.choice([0, 0, 1, 2])

        stream = _stream(
            2, 6, 2, 2,
            dict(transform_skip_enabled=True, bdpcm_enabled=True,
                 log2_max_ts_size=4, lfnst_enabled=True, mts_enabled=True,
                 explicit_mts_intra=True, joint_cbcr_enabled=True,
                 dep_quant_enabled=True),
            dict(split_prob=0.5, jccr_prob=0.3), dec_cls=TDec)
        _check(stream, tmp_path, 2)


class TestChroma444:
    @pytest.mark.parametrize("seed", range(2))
    def test_444_intra(self, seed, tmp_path):
        stream = _stream(3, seed, 2, 2, {},
                         dict(split_prob=0.5, isp_prob=0.2, mip_prob=0.2,
                              jccr_prob=0.3))
        _check(stream, tmp_path, 2)

    def test_444_cclm(self, tmp_path):
        stream = _stream(3, 3, 2, 2, dict(cclm_enabled=True),
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    def test_444_dual_tree(self, tmp_path):
        stream = _stream(3, 4, 2, 2,
                         dict(dual_tree_intra=True, cclm_enabled=True,
                              min_qt_size=[8, 8, 8], max_mtt_depth=[2, 2, 2],
                              max_bt_size=[32, 32, 32],
                              max_tt_size=[32, 32, 32]),
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("st", [0, 1])
    def test_444_inter(self, st, tmp_path):
        stream = _stream(3, 5 + st, 4, st, dict(temporal_mvp_enabled=True),
                         dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                              mv_range=24, bi_prob=0.5))
        _check(stream, tmp_path, 4)

    def test_444_transforms(self, tmp_path):
        from vvdec_tpu.testenc.encoder import RandomDecisions

        class TDec(RandomDecisions):
            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.3

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

        stream = _stream(
            3, 6, 2, 2,
            dict(transform_skip_enabled=True, log2_max_ts_size=4,
                 lfnst_enabled=True, mts_enabled=True,
                 explicit_mts_intra=True, joint_cbcr_enabled=True),
            dict(split_prob=0.5, jccr_prob=0.3), dec_cls=TDec)
        _check(stream, tmp_path, 2)

    def test_444_sao(self, tmp_path):
        stream = _stream(3, 7, 2, 2, dict(sao_enabled=True),
                         dict(split_prob=0.5, sao_prob=0.7))
        _check(stream, tmp_path, 2)
