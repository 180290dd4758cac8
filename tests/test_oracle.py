"""Oracle tests: generated streams must decode in the reference vvdec binary.

Skipped when the binary is absent; build it per .claude/skills/verify/SKILL.md.
"""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def ref_decode(stream: bytes, tmp_path, expect_frames: int = 1) -> bytes:
    bit = tmp_path / "t.266"
    yuv = tmp_path / "t.yuv"
    bit.write_bytes(stream)
    r = subprocess.run(
        [VVDECAPP, "-b", str(bit), "-o", str(yuv), "-t", "1"],
        capture_output=True, text=True, timeout=120)
    assert f"{expect_frames} frames decoded" in r.stdout, r.stdout + r.stderr
    assert "ERROR" not in r.stdout, r.stdout
    return yuv.read_bytes()


class TestOracleAccepts:
    @pytest.mark.parametrize("seed", range(3))
    def test_splits(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    dec_kw=dict(split_prob=0.6))
        ref_decode(stream, tmp_path)

    def test_ctu128_and_boundary(self, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=144, height=96, ctu=128, seed=5,
                                    dec_kw=dict(split_prob=0.4))
        ref_decode(stream, tmp_path)

    def test_multi_frame(self, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=64, height=64, n_frames=3, seed=2)
        ref_decode(stream, tmp_path, expect_frames=3)


def md5_compare(tmp_path, **kw):
    import hashlib

    import numpy as np

    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc.encoder import generate_stream

    stream, _ = generate_stream(**kw)
    ref = ref_decode(stream, tmp_path, expect_frames=kw.get("n_frames", 1))
    out = decode_to_yuv(stream)
    assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest(), \
        "decoded YUV differs from reference"


class TestBitExactRecon:
    """Full decode (parse + intra recon) must match the reference bit-exactly."""

    @pytest.mark.parametrize("seed", range(4))
    def test_intra_random(self, seed, tmp_path):
        md5_compare(tmp_path, width=64, height=64, seed=seed,
                    dec_kw=dict(split_prob=0.5))

    def test_boundary_and_ctu128(self, tmp_path):
        md5_compare(tmp_path, width=80, height=48, seed=11,
                    dec_kw=dict(split_prob=0.4))
        md5_compare(tmp_path, width=128, height=128, ctu=128, seed=12,
                    dec_kw=dict(split_prob=0.4))

    @pytest.mark.parametrize("qp", [5, 27, 51])
    def test_qp_extremes(self, qp, tmp_path):
        md5_compare(tmp_path, width=64, height=64, seed=qp, qp=qp,
                    dec_kw=dict(split_prob=0.4))

    def test_multi_frame(self, tmp_path):
        md5_compare(tmp_path, width=64, height=64, n_frames=3, seed=9,
                    dec_kw=dict(split_prob=0.5))
