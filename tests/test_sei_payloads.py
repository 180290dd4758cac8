"""Structured SEI payload parsing (frame-field info, display metadata,
scalable nesting with nested-message extraction)."""


def test_frame_field_info_roundtrip():
    from vvdec_tpu.hls.sei import (SEI_FRAME_FIELD_INFO, SeiMessage,
                                   parse_sei_payload)
    from vvdec_tpu.testenc.bitwriter import BitWriter
    w = BitWriter()
    w.u(1, 1)   # field_pic_flag
    w.u(1, 1)   # bottom_field_flag
    w.u(1, 1)   # pairing_indicated
    w.u(1, 1)   # paired_with_next
    w.u(0, 2)   # source_scan_type
    w.u(0, 1)   # duplicate
    w.u(0, 1)   # pad
    f = parse_sei_payload(SeiMessage(SEI_FRAME_FIELD_INFO, w.bytes()))
    assert f.field_pic_flag and f.bottom_field_flag
    assert f.pairing_indicated_flag and f.paired_with_next_field


def test_scalable_nesting_extracts_nested_dph():
    import numpy as np
    from vvdec_tpu.hls.sei import (SEI_DECODED_PICTURE_HASH,
                                   SEI_SCALABLE_NESTING, SeiMessage,
                                   make_dph_sei, parse_dph,
                                   parse_sei_payload)
    from vvdec_tpu.testenc.bitwriter import BitWriter
    planes = [np.zeros((8, 8), dtype=np.uint16)] * 3
    dph = make_dph_sei(planes, 10, 0)
    w = BitWriter()
    w.u(0, 1)   # ols_flag
    w.u(0, 1)   # subpic_flag
    w.u(1, 1)   # all_layers
    w.ue(0)     # num_seis - 1
    while w.bitpos % 8:
        w.u(1, 1)  # nesting alignment bits (equal to 1)
    payload = bytearray(w.bytes())
    # nested SEI framing: type byte + size byte + payload
    payload.append(dph.payload_type)
    payload.append(len(dph.payload))
    payload += dph.payload
    n = parse_sei_payload(SeiMessage(SEI_SCALABLE_NESTING, bytes(payload)))
    assert len(n.messages) == 1
    nested = n.messages[0]
    assert nested.payload_type == SEI_DECODED_PICTURE_HASH
    assert parse_dph(nested).digest == parse_dph(dph).digest


def test_mastering_display_and_cll():
    from vvdec_tpu.hls.sei import (SEI_CONTENT_LIGHT_LEVEL_INFO,
                                   SEI_MASTERING_DISPLAY_COLOUR_VOLUME,
                                   SeiMessage, parse_sei_payload)
    md = parse_sei_payload(SeiMessage(
        SEI_MASTERING_DISPLAY_COLOUR_VOLUME,
        b"".join(v.to_bytes(2, "big") for v in
                 (100, 200, 300, 400, 500, 600, 700, 800))
        + (1000).to_bytes(4, "big") + (1).to_bytes(4, "big")))
    assert md.primaries[0] == (100, 200)
    assert md.white_point == (700, 800)
    assert md.max_luminance == 1000
    cll = parse_sei_payload(SeiMessage(SEI_CONTENT_LIGHT_LEVEL_INFO,
                                       b"\x04\x00\x02\x00"))
    assert cll.max_content_light_level == 1024


def test_field_weaving():
    import numpy as np
    from vvdec_tpu.app import weave_fields
    from vvdec_tpu.hls.sei import SEI_FRAME_FIELD_INFO, SeiMessage
    from vvdec_tpu.testenc.bitwriter import BitWriter

    def ffi(bottom):
        w = BitWriter()
        w.u(1, 1)           # field_pic
        w.u(int(bottom), 1)
        w.u(1, 1)           # pairing indicated
        w.u(1, 1)           # paired with next
        w.u(0, 2)
        w.u(0, 1)
        w.u(0, 1)
        return SeiMessage(SEI_FRAME_FIELD_INFO, w.bytes())

    top = [np.full((4, 8), 1, dtype=np.uint16)]
    bot = [np.full((4, 8), 2, dtype=np.uint16)]
    out = weave_fields([(top, [ffi(False)]), (bot, [ffi(True)])])
    assert len(out) == 1
    assert out[0][0].shape == (8, 8)
    assert (out[0][0][0::2] == 1).all() and (out[0][0][1::2] == 2).all()
    # progressive passthrough
    prog = [np.zeros((4, 8), dtype=np.uint16)]
    assert len(weave_fields([(prog, [])])) == 1
