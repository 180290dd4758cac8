"""Public API surface: streaming Decoder, DPB bumping, frame locking,
SEI query, hash error counting, film grain synthesis."""

import numpy as np
import pytest


def _stream(n_frames=3, seed=3):
    from vvdec_tpu.testenc.encoder import generate_stream
    return generate_stream(width=96, height=64, ctu=32, n_frames=n_frames,
                           seed=seed, qp=32,
                           dec_kw=dict(split_prob=0.3, density=0.1))[0]


def test_streaming_decode_matches_batch():
    from vvdec_tpu.api import Decoder
    from vvdec_tpu.decoder import decode_annexb
    stream = _stream(4)
    batch = decode_annexb(stream)
    dec = Decoder()
    frames = dec.decode(stream) + dec.flush()
    assert len(frames) == len(batch) == 4
    for f, b in zip(frames, batch):
        for p, q in zip(f.planes, b):
            assert np.array_equal(p, q)


def test_streaming_per_au_push():
    """Pushing the stream AU-by-AU yields the same frames in the same order
    as a single batch push (the vvdec_decode per-AU usage pattern)."""
    from vvdec_tpu.api import Decoder
    from vvdec_tpu.decoder import decode_annexb
    # three separate single-frame streams share parameter sets, so feed the
    # header once and then each frame's slice data as its own AU chunk
    stream = _stream(3)
    batch = decode_annexb(stream)
    # split at every start code and regroup: headers first, then per-VCL
    import re
    starts = [m.start() for m in re.finditer(b"\x00\x00\x01", stream)]
    chunks = [stream[a:b] for a, b in zip(starts, starts[1:] + [len(stream)])]
    dec = Decoder()
    frames = []
    for c in chunks:
        frames.extend(dec.decode(c))
    frames.extend(dec.flush())
    assert len(frames) == len(batch)
    for f, b in zip(frames, batch):
        for p, q in zip(f.planes, b):
            assert np.array_equal(p, q)


def test_frame_unref_releases_dpb():
    from vvdec_tpu.api import Decoder
    stream = _stream(3)
    dec = Decoder()
    frames = dec.decode(stream) + dec.flush()
    assert all(f.picture.locked_by_application for f in frames)
    for f in frames:
        dec.frame_unref(f)
    assert all(not p.locked_by_application for p in dec._core.plm.pictures())


def test_find_frame_sei_dph():
    from vvdec_tpu.api import Decoder
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.sei import (SEI_DECODED_PICTURE_HASH, make_dph_sei,
                                   write_sei_nal)
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.testenc.encoder import make_nal
    stream = _stream(1)
    planes = decode_annexb(stream)[0]
    sei = make_dph_sei(planes, 10, 0)
    stream2 = stream + make_nal(NalUnitType.SUFFIX_SEI, write_sei_nal([sei]))
    from vvdec_tpu.api import DecoderParams
    dec = Decoder(DecoderParams(verify_picture_hash=True))
    frames = dec.decode(stream2) + dec.flush()
    m = dec.find_frame_sei(frames[0], SEI_DECODED_PICTURE_HASH)
    assert m is not None
    assert dec.get_hash_error_count() == 0


def test_hash_error_counted_when_not_strict():
    from vvdec_tpu.api import Decoder, DecoderParams
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.sei import make_dph_sei, write_sei_nal
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.testenc.encoder import make_nal
    stream = _stream(1)
    planes = decode_annexb(stream)[0]
    sei = make_dph_sei(planes, 10, 0)
    bad = bytes(sei.payload[:-1]) + bytes([sei.payload[-1] ^ 0xFF])
    sei.payload = bad
    stream2 = stream + make_nal(NalUnitType.SUFFIX_SEI, write_sei_nal([sei]))
    dec = Decoder(DecoderParams(verify_picture_hash=False))
    dec.decode(stream2)
    dec.flush()
    assert dec.get_hash_error_count() == 1


def test_dpb_bumping_poc_order():
    from vvdec_tpu.dpb import DecodedPicture, PicListManager
    plm = PicListManager()
    # decode order 0, 4, 2, 1, 3 with num_reorder = 2
    for poc in (0, 4, 2, 1, 3):
        plm.add(DecodedPicture(poc=poc, planes=[], is_idr=poc == 0))
    out = plm.drain(num_reorder=2)
    assert [p.poc for p in out] == [0, 1, 2, 3, 4]


def test_dpb_idr_flushes_prior_pictures():
    from vvdec_tpu.dpb import DecodedPicture, PicListManager
    plm = PicListManager()
    plm.add(DecodedPicture(poc=0, planes=[], is_idr=True))
    plm.add(DecodedPicture(poc=1, planes=[]))
    # next IDR arrives: everything before it must bump out.  The tune-in
    # delay makes the first few polls return None (parity: m_tuneInDelay,
    # PicListManager.cpp:345), so poll as an app decoding AUs would.
    plm.add(DecodedPicture(poc=0, planes=[], is_idr=True))
    got = []
    for _ in range(20):
        p = plm.get_next_output(num_reorder=4)
        if p is not None:
            got.append(p.poc)
        if len(got) == 2:
            break
    assert got == [0, 1]


# ---------------------------------------------------------------------------
# film grain
# ---------------------------------------------------------------------------
def _fgc_sei(cancel=False, sigma=40):
    """Minimal FGC SEI payload: model 0, luma-only, one interval."""
    from vvdec_tpu.hls.sei import SEI_FILM_GRAIN_CHARACTERISTICS, SeiMessage
    from vvdec_tpu.testenc.bitwriter import BitWriter
    w = BitWriter()
    w.u(1 if cancel else 0, 1)
    if not cancel:
        w.u(0, 2)            # model_id
        w.u(0, 1)            # separate_colour_description
        w.u(0, 2)            # blending_mode_id
        w.u(5, 4)            # log2_scale_factor
        w.u(1, 1)            # comp_model_present[0]
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 8)            # num_intensity_intervals_minus1
        w.u(2, 3)            # num_model_values_minus1 -> 3
        w.u(0, 8)            # lower
        w.u(255, 8)          # upper
        w.se(sigma)          # sigma
        w.se(8)              # fh
        w.se(8)              # fv
        w.u(0, 1)            # persistence
    w.u(1, 1)                # rbsp stop
    while w.bitpos % 8:
        w.u(0, 1)
    return SeiMessage(payload_type=SEI_FILM_GRAIN_CHARACTERISTICS,
                      payload=w.bytes())


def test_film_grain_applied_and_deterministic():
    from vvdec_tpu.api import Decoder, DecoderParams
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.sei import write_sei_nal
    from vvdec_tpu.testenc.encoder import make_nal
    stream = _stream(1)
    sei_nal = make_nal(NalUnitType.PREFIX_SEI, write_sei_nal([_fgc_sei()]))
    # prefix SEI precedes the frame's VCL NALs: splice after parameter sets
    from vvdec_tpu.decoder import decode_annexb
    plain = decode_annexb(stream)[0]

    def run():
        dec = Decoder(DecoderParams(film_grain_synthesis=True))
        return (dec.decode(stream[:0] + sei_nal + stream) + dec.flush())[0]

    f1, f2 = run(), run()
    assert any(not np.array_equal(p, q) for p, q in zip(f1.planes, plain))
    for p, q in zip(f1.planes, f2.planes):
        assert np.array_equal(p, q)
    # grain off -> untouched output
    dec = Decoder(DecoderParams(film_grain_synthesis=False))
    f3 = (dec.decode(sei_nal + stream) + dec.flush())[0]
    for p, q in zip(f3.planes, plain):
        assert np.array_equal(p, q)


def test_film_grain_cancel_flag():
    from vvdec_tpu.api import Decoder, DecoderParams
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.sei import write_sei_nal
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.testenc.encoder import make_nal
    stream = _stream(1)
    plain = decode_annexb(stream)[0]
    sei_nal = make_nal(NalUnitType.PREFIX_SEI,
                       write_sei_nal([_fgc_sei(cancel=True)]))
    dec = Decoder(DecoderParams(film_grain_synthesis=True))
    f = (dec.decode(sei_nal + stream) + dec.flush())[0]
    for p, q in zip(f.planes, plain):
        assert np.array_equal(p, q)


def test_external_buffer_allocator():
    """vvdec_decoder_open_with_allocator analog: output planes land in
    app-provided buffers, released through frame_unref."""
    import numpy as np

    from vvdec_tpu.api import Decoder, DecoderParams
    from vvdec_tpu.testenc.encoder import generate_stream

    stream, _ = generate_stream(width=64, height=64, n_frames=2, seed=3,
                                dec_kw=dict(split_prob=0.4))
    allocated, released = [], []

    def alloc(w, h, bd, fmt):
        bufs = [np.zeros((h, w), dtype=np.uint16),
                np.zeros((h // 2, w // 2), dtype=np.uint16),
                np.zeros((h // 2, w // 2), dtype=np.uint16)]
        allocated.append(bufs)
        return bufs

    dec = Decoder(DecoderParams(buffer_allocator=alloc,
                                buffer_unref=released.append))
    ref = Decoder().decode(stream) + Decoder().flush()
    frames = dec.decode(stream) + dec.flush()
    assert len(allocated) == 2
    for f, bufs in zip(frames, allocated):
        assert f.planes is bufs
        assert bufs[0].any()
        dec.frame_unref(f)
    assert len(released) == 2


def test_decoder_info_and_version():
    from vvdec_tpu import api
    info = Decoder().get_decoder_info() if False else \
        api.Decoder().get_decoder_info()
    assert "vvdec_tpu" in info and "KERNELS=" in info
    assert api.version()


def test_frame_exposes_vui_and_hrd():
    """Frames carry the parsed SPS VUI/HRD like vvdecFrame->picAttributes."""
    from vvdec_tpu.api import Decoder
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(64, 64)
    sps.vui_present = True
    sps.vui = {"progressive_source": True, "aspect_ratio_constant": True,
               "aspect_ratio_idc": 1, "colour_primaries": 9,
               "transfer_characteristics": 16, "matrix_coeffs": 9,
               "full_range": False}
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    nal, _ = E.encode_frame(sps, pps, RandomDecisions(seed=1), qp=32,
                            poc=0, idr=True)
    stream += nal
    with Decoder() as dec:
        frames = dec.decode(stream) + dec.flush()
    assert len(frames) == 1
    assert frames[0].vui["colour_primaries"] == 9
    assert frames[0].vui["sar_width"] == 1  # from the fixed SAR table
    assert frames[0].hrd is None
