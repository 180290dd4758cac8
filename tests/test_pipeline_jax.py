"""JAX device pipeline vs numpy golden (CPU backend, 8 virtual devices)."""

import hashlib

import pytest

from vvdec_tpu.decoder import decode_to_yuv
from vvdec_tpu.testenc.encoder import generate_stream


class TestJaxPipeline:
    @pytest.mark.parametrize("seed", range(3))
    def test_itx_matches_golden(self, seed):
        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    dec_kw=dict(split_prob=0.5))
        a = decode_to_yuv(stream, use_jax=False)
        b = decode_to_yuv(stream, use_jax=True)
        assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()

    def test_larger_frame(self):
        stream, _ = generate_stream(width=128, height=96, ctu=64, seed=7,
                                    dec_kw=dict(split_prob=0.4))
        a = decode_to_yuv(stream, use_jax=False)
        b = decode_to_yuv(stream, use_jax=True)
        assert a == b


class TestGraftEntry:
    def test_entry_compiles_cpu(self):
        import jax

        from __graft_entry__ import entry
        fn, args = entry()
        out = fn(*args)
        out.block_until_ready()
        assert out.shape == args[0].shape

    def test_dryrun_multichip(self):
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)


def test_sao_device_stage_matches_host():
    """Whole-frame device SAO (ops/pipeline.sao_frame_jax) vs the host
    golden, on a SAO-enabled inter stream."""
    import numpy as np

    from tests.test_oracle import _inter_stream
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.hls.params import B_SLICE

    stream = _inter_stream(
        5, 4, B_SLICE, lambda f: ((1,), (1,)),
        dict(split_prob=0.4, inter_prob=0.6, skip_prob=0.2, mv_range=24),
        sao=True)
    ref = decode_annexb(stream)
    got = decode_annexb(stream, use_jax=True)
    assert all(np.array_equal(a, b)
               for fa, fb in zip(ref, got) for a, b in zip(fa, fb))


def test_alf_device_stage_matches_host():
    """Whole-frame device ALF/CC-ALF (ops/pipeline.alf_frame_jax) vs the
    host golden, incl. inter frames."""
    import numpy as np

    from tests.test_alf import _alf_stream
    from vvdec_tpu.decoder import decode_annexb

    stream = _alf_stream(2, 4, 1, dict(temporal_mvp_enabled=True),
                         dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                              mv_range=40, bi_prob=0.5), n_aps=3)
    ref = decode_annexb(stream)
    got = decode_annexb(stream, use_jax=True)
    assert all(np.array_equal(a, b)
               for fa, fb in zip(ref, got) for a, b in zip(fa, fb))


def test_alf_device_stage_boundaries():
    """Device ALF with loop-filter-across disabled (clamp windows) and
    virtual boundaries (sub-area splits)."""
    import numpy as np

    from tests.test_alf import TestAlfAcrossBoundaries
    from tests.test_virtual_boundaries import _vb_stream
    from vvdec_tpu.decoder import decode_annexb

    t = TestAlfAcrossBoundaries()
    pps_kw = dict(t.TILES, loop_filter_across_tiles=False)
    for stream in (t._stream(1, pps_kw), _vb_stream(2, alf=True)):
        ref = decode_annexb(stream)
        got = decode_annexb(stream, use_jax=True)
        assert all(np.array_equal(a, b)
                   for fa, fb in zip(ref, got) for a, b in zip(fa, fb))


def test_deblock_device_stage_matches_host():
    """Whole-frame device deblocking (ops/pipeline.deblock_frame_jax) vs
    the host golden, on inter streams with large blocks (long filters)."""
    import numpy as np

    from tests.test_oracle import _inter_stream
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.hls.params import B_SLICE

    stream = _inter_stream(
        9, 4, B_SLICE, lambda f: ((1,), (1,)),
        dict(split_prob=0.25, inter_prob=0.7, skip_prob=0.2, mv_range=32,
             bi_prob=0.5))
    ref = decode_annexb(stream)
    got = decode_annexb(stream, use_jax=True)
    assert all(np.array_equal(a, b)
               for fa, fb in zip(ref, got) for a, b in zip(fa, fb))


def test_deblock_device_stage_boundaries():
    """Device deblocking with virtual boundaries (strengths zeroed on VB
    rows/cols) stays bit-exact vs the host golden."""
    import numpy as np

    from tests.test_virtual_boundaries import _vb_stream
    from vvdec_tpu.decoder import decode_annexb

    stream = _vb_stream(3, n_frames=2)
    ref = decode_annexb(stream)
    got = decode_annexb(stream, use_jax=True)
    assert all(np.array_equal(a, b)
               for fa, fb in zip(ref, got) for a, b in zip(fa, fb))
