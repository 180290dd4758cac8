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
        # fresh subprocess, matching how the driver invokes it: the
        # 8-virtual-device compiles are memory-heavy, and XLA:CPU can
        # segfault compiling them inside a long-lived full-suite process
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # dryrun sets its own device count
        r = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8); "
             "print('DRYRUN_OK')"],
            cwd=repo, env=env, capture_output=True, text=True,
            timeout=1200)
        assert r.returncode == 0 and "DRYRUN_OK" in r.stdout, \
            (r.returncode, r.stdout[-500:], r.stderr[-2000:])


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


def test_device_itx_lfnst_parity():
    """LFNST TUs now run dequant + inverse LFNST + ITX on device
    (_itx_lfnst_fn) instead of falling back to the host: use_jax
    parity on an LFNST-heavy stream."""
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc.encoder import RandomDecisions, generate_stream

    class LfnstDec(RandomDecisions):
        def lfnst_idx(self, cu):
            return self.rnd.choice([1, 2])

    import vvdec_tpu.testenc.encoder as E
    orig = E.RandomDecisions
    E.RandomDecisions = LfnstDec
    try:
        s, css = generate_stream(
            width=96, height=64, ctu=32, n_frames=2, seed=1, qp=30,
            sps_kw=dict(lfnst_enabled=True),
            dec_kw=dict(split_prob=0.5, density=0.08, max_level=20))
    finally:
        E.RandomDecisions = orig
    assert sum(1 for cs in css for cu in cs.cus if cu.lfnst_idx) >= 4
    a = decode_to_yuv(s, use_jax=False)
    b = decode_to_yuv(s, use_jax=True)
    assert a == b
    # drive the device residual stage directly: itx_frame_jax must match
    # the host per-TU dequant + inverse LFNST + ITX on every LFNST TU
    import numpy as np
    import vvdec_tpu.ops.pipeline as P
    from vvdec_tpu.decoder import parse_annexb
    from vvdec_tpu.frame.recon_np import (
        apply_inv_lfnst, dequant_block, get_tr_types, inverse_transform,
        scaling_matrix_for, tu_qp)
    n_lf = []
    inner = P._itx_lfnst_fn

    def spy(*args, **kw):
        n_lf.append(args)
        return inner(*args, **kw)

    P._itx_lfnst_fn = spy
    try:
        for f in parse_annexb(s):
            cs = f.cs
            resi = P.itx_frame_jax(cs)
            for tu in cs.tus:
                cu = cs.cus[tu.cu_idx]
                if not cu.lfnst_idx or not tu.cbf[0]                         or tu.blocks[0] is None:
                    continue
                x, y, w, h = tu.blocks[0]
                deq = dequant_block(
                    cs.coef[0][y:y + h, x:x + w], tu_qp(cs, tu, cu, 0),
                    w.bit_length() - 1, h.bit_length() - 1,
                    cs.sps.bit_depth,
                    bool(cs.sh_of(cu).dep_quant_used),
                    tu.max_scan_x[0], tu.max_scan_y[0],
                    scale_mat=scaling_matrix_for(cs, tu, cu, 0))
                deq = apply_inv_lfnst(
                    cs, deq, tu, cu, 0,
                    lambda cu_, c_: cu_.intra_dir[0])
                hor, ver = get_tr_types(cs, tu, cu, 0)
                gold = inverse_transform(deq, hor, ver, cs.sps.bit_depth)
                assert np.array_equal(resi[0][y:y + h, x:x + w], gold),                     (x, y, w, h)
    finally:
        P._itx_lfnst_fn = inner
    assert n_lf, "device LFNST stage not exercised"
