"""SEI message parsing + decoded-picture-hash computation.

Behavioral parity (re-designed, not ported):
  - SEI framing:  SEIReader::parseSEImessage / xReadSEImessage
                  (SEIread.cpp:133-182)
  - DPH payload:  xParseSEIDecodedPictureHash (SEIread.cpp:443)
  - hashes:       calcMD5 / compCRC / compChecksum (PicYuvMD5.cpp:76-210)
  - verification: DecLib::checkPictureHashSEI (DecLib.cpp:480)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

# payload types (include/vvdec/sei.h)
SEI_BUFFERING_PERIOD = 0
SEI_PICTURE_TIMING = 1
SEI_FILLER_PAYLOAD = 3
SEI_USER_DATA_UNREGISTERED = 5
SEI_FILM_GRAIN_CHARACTERISTICS = 19
SEI_FRAME_FIELD_INFO = 168
SEI_DECODED_PICTURE_HASH = 132
SEI_SCALABLE_NESTING = 133
SEI_MASTERING_DISPLAY_COLOUR_VOLUME = 137
SEI_CONTENT_LIGHT_LEVEL_INFO = 144

HASH_MD5, HASH_CRC, HASH_CHECKSUM = 0, 1, 2


@dataclass
class SeiMessage:
    payload_type: int = 0
    payload: bytes = b""


@dataclass
class DecodedPictureHash:
    method: int = HASH_MD5
    single_comp: bool = False
    digest: bytes = b""


def parse_sei_nal(rbsp: bytes) -> list[SeiMessage]:
    """Parse all SEI messages of one SEI NAL (payload stored raw;
    typed decoding per payload as needed)."""
    data = rbsp[2:]  # skip NAL header
    out = []
    pos = 0
    while pos < len(data) - 1:  # leave the rbsp trailing byte
        ptype = 0
        while True:
            v = data[pos]
            pos += 1
            ptype += v
            if v != 0xFF:
                break
        psize = 0
        while True:
            v = data[pos]
            pos += 1
            psize += v
            if v != 0xFF:
                break
        out.append(SeiMessage(ptype, data[pos:pos + psize]))
        pos += psize
    return out


def parse_dph(msg: SeiMessage) -> DecodedPictureHash:
    d = DecodedPictureHash()
    d.method = msg.payload[0]
    d.single_comp = bool(msg.payload[1] >> 7)
    d.digest = msg.payload[2:]
    return d


def write_sei_nal(messages: list[SeiMessage]) -> bytes:
    """SEI NAL RBSP body (caller wraps with make_nal)."""
    out = bytearray()
    for m in messages:
        t = m.payload_type
        while t >= 0xFF:
            out.append(0xFF)
            t -= 0xFF
        out.append(t)
        s = len(m.payload)
        while s >= 0xFF:
            out.append(0xFF)
            s -= 0xFF
        out.append(s)
        out += m.payload
    out.append(0x80)  # rbsp trailing bits
    return bytes(out)


def make_dph_sei(planes: list[np.ndarray], bit_depth: int,
                 method: int = HASH_MD5) -> SeiMessage:
    digest = calc_picture_hash(planes, bit_depth, method)
    payload = bytes([method, 0x00]) + digest
    return SeiMessage(SEI_DECODED_PICTURE_HASH, payload)


# ---------------------------------------------------------------------------
# hash computation (PicYuvMD5.cpp)
# ---------------------------------------------------------------------------

def calc_picture_hash(planes: list[np.ndarray], bit_depth: int,
                      method: int) -> bytes:
    if method == HASH_MD5:
        return b"".join(_md5_plane(p, bit_depth) for p in planes)
    if method == HASH_CRC:
        return b"".join(_crc_plane(p, bit_depth) for p in planes)
    if method == HASH_CHECKSUM:
        return b"".join(_checksum_plane(p, bit_depth) for p in planes)
    raise ValueError(f"unknown hash method {method}")


def _md5_plane(plane: np.ndarray, bit_depth: int) -> bytes:
    if bit_depth > 8:
        data = plane.astype("<u2").tobytes()
    else:
        data = plane.astype(np.uint8).tobytes()
    return hashlib.md5(data).digest()


def _crc_table() -> list[int]:
    def step8(crc):
        for _ in range(8):
            msb = (crc >> 15) & 1
            crc = ((crc << 1) & 0xFFFF) ^ (msb * 0x1021)
        return crc
    return [step8(h << 8) for h in range(256)]


_CRC_T = _crc_table()


def _crc_plane(plane: np.ndarray, bit_depth: int) -> bytes:
    """16-bit CRC with data bits entering at the register bottom
    (compCRC, PicYuvMD5.cpp:99): per sample the low byte is processed
    MSB-first, then the high byte.  Byte-wise via the table identity
    step8(c, B) = T[c>>8] ^ ((c & 0xff) << 8) ^ B."""
    if bit_depth > 8:
        data = plane.astype("<u2").tobytes()
    else:
        data = plane.astype(np.uint8).tobytes()
    crc = 0xFFFF
    t = _CRC_T
    for byte in data:
        crc = t[crc >> 8] ^ ((crc & 0xFF) << 8) ^ byte
    crc = t[crc >> 8] ^ ((crc & 0xFF) << 8)
    crc = t[crc >> 8] ^ ((crc & 0xFF) << 8)
    return bytes([(crc >> 8) & 0xFF, crc & 0xFF])


def _checksum_plane(plane: np.ndarray, bit_depth: int) -> bytes:
    h, w = plane.shape
    xs = np.arange(w, dtype=np.uint32)
    ys = np.arange(h, dtype=np.uint32)[:, None]
    xor_mask = ((xs & 0xFF) ^ (ys & 0xFF) ^ (xs >> 8) ^ (ys >> 8)) \
        .astype(np.uint32)
    p = plane.astype(np.uint32)
    total = int((((p & 0xFF) ^ xor_mask).sum()))
    if bit_depth > 8:
        total += int(((p >> 8) ^ xor_mask).sum())
    total &= 0xFFFFFFFF
    return total.to_bytes(4, "big")


# ---------------------------------------------------------------------------
# film grain characteristics (payload type 19)
# ---------------------------------------------------------------------------
@dataclass
class CompModel:
    present: bool = False
    num_model_values: int = 0
    # per interval: (lower_bound, upper_bound, [model values])
    intervals: list = field(default_factory=list)


@dataclass
class FilmGrainCharacteristics:
    """Parsed FGC SEI (xParseSEIFilmGrainCharacteristics, SEIread.cpp)."""

    cancel: bool = False
    model_id: int = 0
    separate_colour_description: bool = False
    bit_depth_luma: int = 0
    bit_depth_chroma: int = 0
    full_range: bool = False
    colour_primaries: int = 0
    transfer_characteristics: int = 0
    matrix_coeffs: int = 0
    blending_mode_id: int = 0
    log2_scale_factor: int = 0
    comp_model: list = field(default_factory=lambda: [CompModel(),
                                                      CompModel(),
                                                      CompModel()])
    persistence: bool = False


def parse_fgc(msg: SeiMessage) -> FilmGrainCharacteristics:
    """Film grain characteristics SEI payload
    (xParseSEIFilmGrainCharacteristics, SEIread.cpp)."""
    from vvdec_tpu.bitstream.reader import BitReader
    r = BitReader(msg.payload)
    f = FilmGrainCharacteristics()
    f.cancel = bool(r.u(1))
    if f.cancel:
        return f
    f.model_id = r.u(2)
    f.separate_colour_description = bool(r.u(1))
    if f.separate_colour_description:
        f.bit_depth_luma = r.u(3) + 8
        f.bit_depth_chroma = r.u(3) + 8
        f.full_range = bool(r.u(1))
        f.colour_primaries = r.u(8)
        f.transfer_characteristics = r.u(8)
        f.matrix_coeffs = r.u(8)
    f.blending_mode_id = r.u(2)
    f.log2_scale_factor = r.u(4)
    for c in range(3):
        f.comp_model[c].present = bool(r.u(1))
    for c in range(3):
        cm = f.comp_model[c]
        if not cm.present:
            continue
        n_int = r.u(8) + 1
        cm.num_model_values = r.u(3) + 1
        if cm.num_model_values > 6:
            raise ValueError("num_model_values out of range")
        for _ in range(n_int):
            lo = r.u(8)
            hi = r.u(8)
            vals = [r.se() for _ in range(cm.num_model_values)]
            cm.intervals.append((lo, hi, vals))
    f.persistence = bool(r.u(1))
    return f


# ---------------------------------------------------------------------------
# structured payloads for the remaining common SEIs
# (SEIread.cpp xParseSEI*; payload numbering include/vvdec/sei.h:51-77)
# ---------------------------------------------------------------------------
SEI_AMBIENT_VIEWING_ENVIRONMENT = 148
SEI_CONTENT_COLOUR_VOLUME = 149


@dataclass
class FrameFieldInfo:
    """Frame-field info SEI (xParseSEIFrameFieldInfo)."""

    field_pic_flag: bool = False
    bottom_field_flag: bool = False
    pairing_indicated_flag: bool = False
    paired_with_next_field: bool = False
    display_fields_from_frame: bool = False
    top_field_first: bool = False
    display_elemental_periods: int = 1
    source_scan_type: int = 0
    duplicate_flag: bool = False


def parse_frame_field_info(msg: SeiMessage) -> FrameFieldInfo:
    from vvdec_tpu.bitstream.reader import BitReader
    r = BitReader(msg.payload)
    f = FrameFieldInfo()
    f.field_pic_flag = bool(r.u(1))
    if f.field_pic_flag:
        f.bottom_field_flag = bool(r.u(1))
        f.pairing_indicated_flag = bool(r.u(1))
        if f.pairing_indicated_flag:
            f.paired_with_next_field = bool(r.u(1))
    else:
        f.display_fields_from_frame = bool(r.u(1))
        if f.display_fields_from_frame:
            f.top_field_first = bool(r.u(1))
        f.display_elemental_periods = r.u(8) + 1
    f.source_scan_type = r.u(2)
    f.duplicate_flag = bool(r.u(1))
    return f


@dataclass
class MasteringDisplayColourVolume:
    primaries: tuple = ()       # 3 x (x, y)
    white_point: tuple = (0, 0)
    max_luminance: int = 0
    min_luminance: int = 0


def parse_mastering_display(msg: SeiMessage) -> MasteringDisplayColourVolume:
    from vvdec_tpu.bitstream.reader import BitReader
    r = BitReader(msg.payload)
    m = MasteringDisplayColourVolume()
    m.primaries = tuple((r.u(16), r.u(16)) for _ in range(3))
    m.white_point = (r.u(16), r.u(16))
    m.max_luminance = r.u(32)
    m.min_luminance = r.u(32)
    return m


@dataclass
class ContentLightLevel:
    max_content_light_level: int = 0
    max_pic_average_light_level: int = 0


def parse_content_light_level(msg: SeiMessage) -> ContentLightLevel:
    from vvdec_tpu.bitstream.reader import BitReader
    r = BitReader(msg.payload)
    return ContentLightLevel(r.u(16), r.u(16))


@dataclass
class UserDataUnregistered:
    uuid: bytes = b""
    data: bytes = b""


def parse_user_data_unregistered(msg: SeiMessage) -> UserDataUnregistered:
    return UserDataUnregistered(msg.payload[:16], msg.payload[16:])


@dataclass
class ScalableNesting:
    """Scalable nesting SEI header + the nested SEI messages
    (xParseSEIScalableNesting)."""

    ols_flag: bool = False
    subpic_flag: bool = False
    ols_idx: list = field(default_factory=list)
    layer_id: list = field(default_factory=list)
    subpic_ids: list = field(default_factory=list)
    messages: list = field(default_factory=list)  # nested SeiMessage list


def parse_scalable_nesting(msg: SeiMessage,
                           subpic_id_len: int = 16) -> ScalableNesting:
    from vvdec_tpu.bitstream.reader import BitReader
    r = BitReader(msg.payload)
    n = ScalableNesting()
    n.ols_flag = bool(r.u(1))
    n.subpic_flag = bool(r.u(1))
    if n.ols_flag:
        num_olss = r.ue() + 1
        for _ in range(num_olss):
            n.ols_idx.append(r.ue())
    else:
        all_layers = bool(r.u(1))
        if not all_layers:
            num_layers = r.ue() + 1
            for _ in range(num_layers):
                n.layer_id.append(r.u(6))
    if n.subpic_flag:
        num_subpics = r.ue() + 1
        id_len = r.ue() + 1
        for _ in range(num_subpics):
            n.subpic_ids.append(r.u(id_len))
    num_seis = r.ue() + 1
    # byte-align before the nested SEI messages
    while r.pos % 8:
        r.u(1)
    data = msg.payload[r.pos // 8:]
    # nested messages use the standard SEI framing
    pos = 0
    for _ in range(num_seis):
        if pos >= len(data):
            break
        ptype = 0
        while data[pos] == 0xFF:
            ptype += 255
            pos += 1
        ptype += data[pos]
        pos += 1
        size = 0
        while data[pos] == 0xFF:
            size += 255
            pos += 1
        size += data[pos]
        pos += 1
        n.messages.append(SeiMessage(ptype, data[pos:pos + size]))
        pos += size
    return n


def parse_sei_payload(msg: SeiMessage):
    """Structured view of a parsed SEI message (dispatch by payload type);
    returns the raw message when no structured parser exists."""
    try:
        if msg.payload_type == SEI_DECODED_PICTURE_HASH:
            return parse_dph(msg)
        if msg.payload_type == SEI_FILM_GRAIN_CHARACTERISTICS:
            return parse_fgc(msg)
        if msg.payload_type == SEI_FRAME_FIELD_INFO:
            return parse_frame_field_info(msg)
        if msg.payload_type == SEI_MASTERING_DISPLAY_COLOUR_VOLUME:
            return parse_mastering_display(msg)
        if msg.payload_type == SEI_CONTENT_LIGHT_LEVEL_INFO:
            return parse_content_light_level(msg)
        if msg.payload_type == SEI_USER_DATA_UNREGISTERED:
            return parse_user_data_unregistered(msg)
        if msg.payload_type == SEI_SCALABLE_NESTING:
            return parse_scalable_nesting(msg)
    except (IndexError, ValueError):
        return msg
    return msg
