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
