"""Pallas kernel golden tests: kernel output vs the scalar numpy golden
(the reference's SIMD-vs-scalar unit-test pattern,
tests/vvdec_unit_test/vvdec_unit_test.cpp — randomized cases per shape)."""

import numpy as np
import pytest


SHAPES = [(4, 4), (8, 8), (16, 16), (32, 32), (4, 16), (32, 8), (64, 64),
          (8, 32)]
KINDS = [("DCT2", "DCT2"), ("DST7", "DST7"), ("DCT8", "DST7"),
         ("DST7", "DCT8")]


@pytest.mark.parametrize("h,w", SHAPES)
@pytest.mark.parametrize("dep_quant", [False, True])
def test_itx_pallas_matches_scalar_golden(h, w, dep_quant):
    from vvdec_tpu.frame.recon_np import dequant_block, inverse_transform
    from vvdec_tpu.ops.pallas.itx import dequant_params, itx_batch_pallas
    from vvdec_tpu.ops.tables import tr_matrix
    import jax.numpy as jnp

    rng = np.random.default_rng(h * 100 + w + dep_quant)
    for hor, ver in KINDS:
        if (hor != "DCT2" or ver != "DCT2") and (h > 32 or w > 32
                                                 or h < 4 or w < 4):
            continue
        n = 17
        levels = rng.integers(-1024, 1024, size=(n, h, w)).astype(np.int32)
        qp = rng.integers(1, 69, size=(n,)).astype(np.int32)
        bit_depth = 10

        scale, rshift, imax = dequant_params(qp, w, h, bit_depth, dep_quant)
        out = np.asarray(itx_batch_pallas(
            jnp.asarray(levels), jnp.asarray(scale), jnp.asarray(rshift),
            jnp.asarray(imax),
            jnp.asarray(tr_matrix(ver, h), dtype=jnp.int32),
            jnp.asarray(tr_matrix(hor, w), dtype=jnp.int32),
            h=h, w=w, bit_depth=bit_depth, interpret=True))

        for i in range(n):
            deq = dequant_block(levels[i], int(qp[i]),
                                w.bit_length() - 1, h.bit_length() - 1,
                                bit_depth, dep_quant, w - 1, h - 1)
            ref = inverse_transform(deq, hor, ver, bit_depth)
            assert np.array_equal(out[i], ref), (hor, ver, i)


def test_itx_pallas_zero_levels():
    from vvdec_tpu.ops.pallas.itx import dequant_params, itx_batch_pallas
    from vvdec_tpu.ops.tables import tr_matrix
    import jax.numpy as jnp
    levels = np.zeros((3, 8, 8), dtype=np.int32)
    qp = np.full(3, 30, dtype=np.int32)
    scale, rshift, imax = dequant_params(qp, 8, 8, 10, False)
    out = np.asarray(itx_batch_pallas(
        jnp.asarray(levels), jnp.asarray(scale), jnp.asarray(rshift),
        jnp.asarray(imax),
        jnp.asarray(tr_matrix("DCT2", 8), dtype=jnp.int32),
        jnp.asarray(tr_matrix("DCT2", 8), dtype=jnp.int32),
        h=8, w=8, bit_depth=10, interpret=True))
    assert not out.any()
