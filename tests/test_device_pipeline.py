"""Device-resident filter chain (ops/device_pipeline) vs the host filters.

The whole deblock/SAO/ALF/CC-ALF chain runs as one jitted program with
per-CTU parameter expansion and 10-bit output packing; these tests assert
byte-exact equality with the host (numpy golden) path end to end, on the
CPU backend (conftest pins JAX_PLATFORMS=cpu).
"""

import sys

import pytest

sys.path.insert(0, "tests")


def _decode_both(stream):
    from vvdec_tpu.decoder import decode_to_yuv
    a = decode_to_yuv(stream, use_jax=False)
    b = decode_to_yuv(stream, use_jax=True)
    return a, b


class TestDeviceFilterChain:
    def test_deblock_sao_intra(self):
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(
            width=96, height=64, ctu=32, n_frames=2, seed=5, qp=30,
            sps_kw=dict(sao_enabled=True),
            sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
            dec_kw=dict(split_prob=0.5, sao_prob=0.7))
        a, b = _decode_both(s)
        assert a == b

    def test_alf_ccalf_intra(self):
        from test_alf import _alf_stream
        s = _alf_stream(2, 2, 2, {},
                        dict(split_prob=0.4, jccr_prob=0.2), n_aps=3)
        a, b = _decode_both(s)
        assert a == b

    def test_full_chain_inter(self):
        from test_alf import _alf_stream
        s = _alf_stream(4, 4, 0, dict(temporal_mvp_enabled=True,
                                      sao_enabled=True),
                        dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                             mv_range=40, sao_prob=0.4), n_aps=2)
        a, b = _decode_both(s)
        assert a == b

    def test_8bit(self):
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(width=96, height=64, ctu=32, n_frames=2,
                               seed=9, qp=26, sps_kw=dict(bit_depth=8),
                               dec_kw=dict(split_prob=0.5))
        a, b = _decode_both(s)
        assert a == b

    def test_444(self):
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(width=96, height=64, ctu=32, n_frames=2,
                               seed=9, qp=26,
                               sps_kw=dict(chroma_format_idc=3),
                               dec_kw=dict(split_prob=0.5))
        a, b = _decode_both(s)
        assert a == b

    def test_ineligible_falls_back(self):
        # virtual boundaries force the host filter path under use_jax
        from vvdec_tpu.testenc.encoder import generate_stream
        s, _ = generate_stream(
            width=96, height=64, ctu=32, n_frames=1, seed=3, qp=30,
            sps_kw=dict(sao_enabled=True,
                        virtual_boundaries_enabled=True,
                        virtual_boundaries_present=True,
                        virtual_boundary_pos_x=[48],
                        virtual_boundary_pos_y=[32]),
            sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
            dec_kw=dict(split_prob=0.5, sao_prob=0.5))
        from vvdec_tpu.decoder import parse_annexb
        from vvdec_tpu.ops.device_pipeline import device_filter_eligible
        assert not device_filter_eligible(parse_annexb(s)[0].cs)
        a, b = _decode_both(s)
        assert a == b


def test_batched_chain_matches_per_frame():
    """filter_frames_device_batch (one dispatch for a GOP) == per-frame
    filter_frame_device on real decoded pictures."""
    import numpy as np
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.ops import device_pipeline as dp
    from vvdec_tpu.testenc.encoder import generate_stream
    s, _ = generate_stream(
        width=96, height=64, ctu=32, n_frames=3, seed=5, qp=30,
        sps_kw=dict(sao_enabled=True),
        sh_kw=dict(sao_enabled_luma=True, sao_enabled_chroma=True),
        dec_kw=dict(split_prob=0.5, sao_prob=0.7))
    captured = []
    real = dp.filter_frame_device

    def spy(cs, planes):
        captured.append((cs, [p.copy() for p in planes]))
        return real(cs, planes)

    dp.filter_frame_device = spy
    try:
        decode_to_yuv(s, use_jax=True)
    finally:
        dp.filter_frame_device = real
    assert len(captured) == 3
    ref = [real(cs, planes).resolve() for cs, planes in captured]
    batch = dp.filter_frames_device_batch(captured)
    for r, pf in zip(ref, batch):
        for a, b in zip(r, pf.resolve()):
            assert np.array_equal(a, b)
