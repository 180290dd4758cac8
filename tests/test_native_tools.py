"""The C intra engine's extended tool set (LFNST / transform-skip /
MIP / CCLM): tool-rich streams must decode with ZERO per-TU Python
fallbacks (the fallback census proves the coverage), bit-exact vs the
reference binary through the existing oracle helpers."""

import hashlib
import os

import pytest

from vvdec_tpu.testenc.encoder import generate_stream

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")


def _census(stream):
    from vvdec_tpu.api import Decoder, DecoderParams
    d = Decoder(DecoderParams())
    frames = d.decode(stream)
    frames += d.flush()
    return d.get_fallback_census(), len(frames)


class TestNativeIntraTools:
    def test_tool_rich_stream_fully_native(self):
        s, _ = generate_stream(
            width=256, height=128, ctu=64, n_frames=2, seed=3, qp=30,
            sps_kw=dict(mip_enabled=True, cclm_enabled=True,
                        lfnst_enabled=True, mts_enabled=True,
                        explicit_mts_intra=True,
                        transform_skip_enabled=True),
            dec_kw=dict(split_prob=0.4, density=0.35, mip_prob=0.25))
        census, n = _census(s)
        assert n == 2
        assert census.get("tu_python", 0) == 0, census

    @pytest.mark.skipif(not os.path.exists(VVDECAPP),
                        reason="reference vvdecapp not built")
    @pytest.mark.parametrize("seed", range(3))
    def test_tool_rich_oracle(self, seed, tmp_path):
        from tests.test_oracle import ref_decode
        from vvdec_tpu.decoder import decode_to_yuv
        s, _ = generate_stream(
            width=128, height=96, ctu=32, n_frames=2, seed=101 + seed,
            qp=28,
            sps_kw=dict(mip_enabled=True, cclm_enabled=True,
                        lfnst_enabled=True, mts_enabled=True,
                        explicit_mts_intra=True,
                        transform_skip_enabled=True),
            dec_kw=dict(split_prob=0.5, density=0.45, mip_prob=0.3))
        ref = ref_decode(s, tmp_path, expect_frames=2)
        out = decode_to_yuv(s)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    def test_dual_tree_lfnst_cclm_fully_native(self):
        s, _ = generate_stream(
            width=128, height=96, ctu=32, n_frames=2, seed=7, qp=29,
            sps_kw=dict(lfnst_enabled=True, cclm_enabled=True,
                        dual_tree_intra=True, min_qt_size=[8, 8, 8],
                        max_mtt_depth=[2, 2, 2],
                        max_bt_size=[32, 32, 32],
                        max_tt_size=[32, 32, 32]),
            dec_kw=dict(split_prob=0.5, density=0.4))
        census, _ = _census(s)
        assert census.get("tu_python", 0) == 0, census
