"""10-bit output hands out zero-copy views of the internal reconstruction
planes (reference parity: vvdecimpl.cpp:953-1056 exposes internal 16-bit
reco pointers; no repack on the output path)."""

import numpy as np

from vvdec_tpu.decoder import StreamDecoder, u16_view
from vvdec_tpu.testenc.encoder import generate_stream


def test_u16_view_is_view_and_correct():
    rng = np.random.default_rng(0)
    p = rng.integers(0, 1024, size=(64, 48)).astype(np.int32)
    v = u16_view(p)
    assert v.dtype == np.uint16
    assert np.shares_memory(v, p)
    assert (v == p.astype(np.uint16)).all()


def test_output_planes_share_internal_memory():
    stream, _ = generate_stream(width=64, height=64, seed=7)
    dec = StreamDecoder()
    pics = dec.push(stream) + dec.flush()
    assert len(pics) == 1
    pic = pics[0]
    internal = dec._refs[pic.poc]
    for out_p, ref_p in zip(pic.planes, internal):
        assert out_p.dtype == np.uint16
        assert np.shares_memory(out_p, ref_p)
        assert (out_p == ref_p.astype(np.uint16)).all()
