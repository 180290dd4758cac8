"""Parallel decode: row-sharded halo filters on an 8-device CPU mesh,
frame-axis sharding, and GOP-segment parallel decode equivalence."""

import numpy as np
import pytest


def test_halo_map_rows_matches_unsharded():
    import jax.numpy as jnp
    from vvdec_tpu.parallel import halo_map_rows, make_decode_mesh, \
        vertical_121
    mesh = make_decode_mesh(8, rows=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1023, size=(64, 128)).astype(np.int32))
    out = np.asarray(halo_map_rows(vertical_121, x, halo=1, mesh=mesh))
    # reference: whole-frame with replicated edge rows
    xp = np.pad(np.asarray(x), ((1, 1), (0, 0)), mode="edge")
    ref = (xp[:-2] + 2 * xp[1:-1] + xp[2:] + 2) >> 2
    assert np.array_equal(out, ref)


def test_frame_parallel_matches_unsharded():
    import jax.numpy as jnp
    from vvdec_tpu.parallel import frame_parallel, make_decode_mesh
    mesh = make_decode_mesh(8, rows=1)

    def stage(batch):
        return jnp.clip((batch * 3 + 2) >> 2, 0, 1023)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1023, size=(16, 32, 64))
                    .astype(np.int32))
    out = np.asarray(frame_parallel(stage, x, mesh))
    assert np.array_equal(out, np.asarray(stage(x)))


def test_split_irap_segments():
    from vvdec_tpu.parallel import split_irap_segments
    from vvdec_tpu.testenc.encoder import generate_stream
    stream, _ = generate_stream(width=96, height=64, ctu=32, n_frames=3,
                                seed=2, qp=32,
                                dec_kw=dict(split_prob=0.3, density=0.1))
    segs = split_irap_segments(stream)
    assert len(segs) == 3  # every frame is an IDR in the generated stream
    # each segment must decode standalone
    from vvdec_tpu.decoder import decode_annexb
    for s in segs:
        assert len(decode_annexb(s)) == 1


def test_gop_parallel_decode_equivalence():
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.parallel import decode_annexb_parallel
    from vvdec_tpu.testenc.encoder import generate_stream
    stream, _ = generate_stream(width=96, height=64, ctu=32, n_frames=4,
                                seed=9, qp=32,
                                dec_kw=dict(split_prob=0.3, density=0.1))
    serial = decode_annexb(stream)
    parallel = decode_annexb_parallel(stream, workers=2)
    assert len(serial) == len(parallel)
    for a, b in zip(serial, parallel):
        for p, q in zip(a, b):
            assert np.array_equal(p, q)
