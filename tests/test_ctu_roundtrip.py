"""End-to-end syntax round-trip: generated stream -> parsed CodingStructure.

The generator encodes with the dual-mode coder; the decoder must reproduce the
exact CU partitioning, intra modes, and coefficient planes.
"""

import numpy as np
import pytest

from vvdec_tpu.decoder import parse_annexb
from vvdec_tpu.testenc.encoder import generate_stream


def check_roundtrip(**kw):
    stream, expected = generate_stream(**kw)
    frames = parse_annexb(stream)
    assert len(frames) == len(expected)
    for frame, exp in zip(frames, expected):
        cs = frame.cs
        assert len(cs.cus) == len(exp.cus), \
            f"CU count mismatch: {len(cs.cus)} vs {len(exp.cus)}"
        for got, want in zip(cs.cus, exp.cus):
            assert (got.x, got.y, got.w, got.h) == (want.x, want.y, want.w, want.h)
            assert got.intra_dir == want.intra_dir, \
                (got.x, got.y, got.w, got.h, got.intra_dir, want.intra_dir)
            assert got.qp == want.qp
        for c in range(cs.num_comp):
            np.testing.assert_array_equal(cs.coef[c], exp.coef[c],
                                          err_msg=f"coef plane {c}")
    return frames


class TestCtuRoundTrip:
    def test_single_ctu_no_split(self):
        check_roundtrip(width=32, height=32, seed=1,
                        dec_kw=dict(split_prob=0.0))

    def test_single_ctu_splits(self):
        check_roundtrip(width=32, height=32, seed=2,
                        dec_kw=dict(split_prob=0.6))

    @pytest.mark.parametrize("seed", range(4))
    def test_multi_ctu(self, seed):
        check_roundtrip(width=64, height=64, seed=seed,
                        dec_kw=dict(split_prob=0.45))

    def test_ctu_64(self):
        check_roundtrip(width=128, height=64, ctu=64, seed=7,
                        dec_kw=dict(split_prob=0.4))

    def test_non_ctu_multiple_picture(self):
        # 80x48 with CTU 32: implicit boundary splits
        check_roundtrip(width=80, height=48, seed=11,
                        dec_kw=dict(split_prob=0.3))

    def test_dc_planar_only(self):
        check_roundtrip(width=64, height=64, seed=3,
                        dec_kw=dict(split_prob=0.5, modes=[0, 1]))

    def test_angular_modes(self):
        check_roundtrip(width=64, height=64, seed=4,
                        dec_kw=dict(split_prob=0.5, modes=list(range(2, 67))))

    def test_sparse_and_dense_coeffs(self):
        check_roundtrip(width=64, height=64, seed=5,
                        dec_kw=dict(split_prob=0.3, density=0.9, max_level=500))
        check_roundtrip(width=64, height=64, seed=6,
                        dec_kw=dict(split_prob=0.3, density=0.02, max_level=3))

    def test_multiple_frames(self):
        check_roundtrip(width=64, height=32, n_frames=3, seed=8)

    def test_qp_values(self):
        for qp in (5, 22, 45, 60):
            check_roundtrip(width=32, height=32, seed=9, qp=qp)
