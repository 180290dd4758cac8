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


class TestShardedChain:
    """Row-sharded dense filter chain == unsharded device chain on real
    decoded pictures (VERDICT round-1 item 4)."""

    def _capture(self, stream):
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.ops import device_pipeline as dp
        captured = []
        real = dp.filter_frame_device

        def spy(cs, planes):
            captured.append((cs, [p.copy() for p in planes]))
            return real(cs, planes)

        dp.filter_frame_device = spy
        try:
            decode_to_yuv(stream, use_jax=True)
        finally:
            dp.filter_frame_device = real
        return captured, real

    def test_sao_deblock_frame_and_row_sharded(self):
        from vvdec_tpu.ops.sharded_chain import filter_frames_sharded
        from vvdec_tpu.parallel import make_decode_mesh
        from vvdec_tpu.testenc.encoder import generate_stream
        # 96-high picture with 32-CTUs over 4 row shards -> 128-row pad
        # (exercises the bottom-padding path)
        s, _ = generate_stream(
            width=128, height=96, ctu=32, n_frames=2, seed=21, qp=30,
            sps_kw=dict(sao_enabled=True),
            sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
            dec_kw=dict(split_prob=0.5, sao_prob=0.8))
        captured, real = self._capture(s)
        assert len(captured) == 2
        mesh = make_decode_mesh(8, rows=4)  # ("frame", "row") = (2, 4)
        ref = [real(cs, planes).resolve()
               for cs, planes in captured]
        out = filter_frames_sharded(captured, mesh)
        for r, o in zip(ref, out):
            for a, b in zip(r, o):
                assert np.array_equal(a, b)

    def test_alf_ccalf_row_sharded(self):
        import jax
        from jax.sharding import Mesh
        from vvdec_tpu.ops.sharded_chain import filter_frames_sharded
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(
            width=96, height=128, ctu=32, n_frames=1, seed=5, qp=30,
            sps_kw=dict(sao_enabled=True, alf_enabled=True,
                        ccalf_enabled=True),
            sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
            dec_kw=dict(split_prob=0.5, sao_prob=0.5))
        captured, real = self._capture(s)
        assert len(captured) == 1
        mesh = Mesh(np.array(jax.devices()[:8]), ("row",))
        ref = real(*captured[0]).resolve()
        out = filter_frames_sharded(captured, mesh, axis="row")[0]
        for a, b in zip(ref, out):
            assert np.array_equal(a, b)


class TestMultihost:
    """decode_annexb_multihost: the GOP/segment distribution path.  This
    environment is single-host, which exercises segment partitioning,
    per-process decode and ordered reassembly; the payload pack/unpack
    round-trip covers the cross-host exchange format."""

    def test_single_process_decode_matches_serial(self):
        import numpy as np
        from vvdec_tpu.decoder import decode_annexb
        from vvdec_tpu.parallel.distributed import decode_annexb_multihost
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(width=96, height=64, ctu=32, n_frames=4,
                               seed=9, qp=30,
                               dec_kw=dict(split_prob=0.4, density=0.3))
        ser = decode_annexb(s)
        out = decode_annexb_multihost(s, use_jax=False)
        assert len(out) == len(ser)
        for (poc, planes), fs in zip(out, ser):
            for a, b in zip(planes, fs):
                assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_payload_roundtrip(self):
        import numpy as np
        from vvdec_tpu.parallel.distributed import (_segment_payload,
                                                    _unpack_payload)

        class _Pic:
            def __init__(self, poc, planes):
                self.poc = poc
                self.planes = planes

        rng = np.random.default_rng(0)
        pics = [_Pic(3, [rng.integers(0, 1023, (16, 24), dtype=np.uint16),
                         rng.integers(0, 1023, (8, 12), dtype=np.uint16),
                         rng.integers(0, 1023, (8, 12), dtype=np.uint16)]),
                _Pic(4, [rng.integers(0, 1023, (16, 24),
                                      dtype=np.uint16)])]
        meta, payload = _segment_payload(pics)
        back = _unpack_payload(meta, payload)
        assert [p for p, _ in back] == [3, 4]
        for (_, planes), pic in zip(back, pics):
            assert len(planes) == len(pic.planes)
            for a, b in zip(planes, pic.planes):
                assert np.array_equal(a, b)
