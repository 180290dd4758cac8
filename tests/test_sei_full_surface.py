"""Structured parsing of the full SEI payload surface
(include/vvdec/sei.h:51-77; SEIread.cpp xParseSEI*), incl. the HRD-coupled
buffering-period / picture-timing / decoding-unit-info trio and
per-subpicture DPH via subpic-flagged scalable nesting (DecLib.cpp:518-569).
"""

import numpy as np
import pytest

from vvdec_tpu.hls import sei as S
from vvdec_tpu.testenc.bitwriter import BitWriter


def _msg(ptype, w: BitWriter, tid=0) -> S.SeiMessage:
    w.byte_align(0)
    return S.SeiMessage(ptype, w.bytes(), tid)


def test_buffering_period_and_picture_timing():
    w = BitWriter()
    w.flag(True)    # bp_nal_hrd_parameters_present
    w.flag(False)   # bp_vcl_hrd_parameters_present
    w.u(23, 5)      # initial_cpb_removal_delay_length_minus1 -> 24
    w.u(15, 5)      # cpb_removal_delay_length_minus1 -> 16
    w.u(9, 5)       # dpb_output_delay_length_minus1 -> 10
    w.flag(False)   # bp_du_hrd_params_present
    w.flag(False)   # concatenation
    w.flag(False)   # additional_concatenation_info
    w.u(4, 16)      # au_cpb_removal_delay_delta_minus1 (len 16)
    w.u(0, 3)       # bp_max_sub_layers_minus1
    w.ue(1)         # bp_cpb_cnt_minus1 -> 2
    for _ in range(2):      # sublayer bp_max-1 only; nal, 2 cpbs
        w.u(111, 24)        # initial_cpb_removal_delay
        w.u(222, 24)        # initial_cpb_removal_offset
    w.flag(False)   # bp_alt_cpb_params_present
    bp = S.parse_sei_payload(_msg(S.SEI_BUFFERING_PERIOD, w))
    assert isinstance(bp, S.BufferingPeriod)
    assert bp.cpb_removal_delay_length == 16
    assert bp.dpb_output_delay_length == 10
    assert bp.cpb_cnt == 2
    assert bp.au_cpb_removal_delay_delta == 5
    assert bp.initial_cpb_removal[(0, 1, 0)] == (111, 222)

    w = BitWriter()
    w.u(41, 16)     # pt_cpb_removal_delay_minus1 (len 16)
    w.u(77, 10)     # pt_dpb_output_delay (len 10)
    w.u(0, 8)       # pt_display_elemental_periods_minus1
    pt = S.parse_sei_payload(_msg(S.SEI_PICTURE_TIMING, w), bp=bp)
    assert isinstance(pt, S.PictureTiming)
    assert pt.au_cpb_removal_delay[0] == 42
    assert pt.dpb_output_delay == 77
    assert pt.display_elemental_periods == 1
    # without the buffering-period context the raw message is returned
    w2 = BitWriter()
    w2.u(41, 16)
    raw = S.parse_sei_payload(_msg(S.SEI_PICTURE_TIMING, w2))
    assert isinstance(raw, S.SeiMessage)


def test_decoding_unit_info():
    bp = S.BufferingPeriod(du_hrd_params_present=True,
                           du_cpb_removal_delay_increment_length=8,
                           dpb_output_delay_du_length=12,
                           du_dpb_params_in_pic_timing=True,
                           max_sublayers=1)
    w = BitWriter()
    w.ue(3)         # decoding_unit_idx
    w.u(99, 8)      # du_spt_cpb_removal_delay_increment[top]
    w.flag(True)    # dpb_output_du_delay_present
    w.u(55, 12)     # pic_spt_dpb_output_du_delay
    d = S.parse_sei_payload(_msg(S.SEI_DECODING_UNIT_INFO, w), bp=bp)
    assert isinstance(d, S.DecodingUnitInfo)
    assert d.decoding_unit_idx == 3
    assert d.du_spt_cpb_removal_delay_increment[0] == 99
    assert d.pic_spt_dpb_output_du_delay == 55


def test_t35_and_unregistered():
    t = S.parse_sei_payload(S.SeiMessage(
        S.SEI_USER_DATA_REGISTERED_ITU_T_T35, b"\xb5hello"))
    assert t.country_code == 0xB5 and t.data == b"hello"
    t2 = S.parse_sei_payload(S.SeiMessage(
        S.SEI_USER_DATA_REGISTERED_ITU_T_T35, b"\xff\x01payload"))
    assert t2.country_code == 255 and t2.country_code_extension == 1
    assert t2.data == b"payload"


def test_frame_packing():
    w = BitWriter()
    w.ue(7)         # arrangement_id
    w.flag(False)   # cancel
    w.u(3, 7)       # arrangement_type (side-by-side)
    w.flag(False)   # quincunx
    w.u(1, 6)       # content_interpretation_type
    w.flag(False)   # spatial_flipping
    w.flag(False)   # frame0_flipped
    w.flag(False)   # field_views
    w.flag(True)    # current_frame_is_frame0
    w.flag(False)
    w.flag(False)
    w.u(1, 4)       # frame0 grid x
    w.u(2, 4)       # frame0 grid y
    w.u(3, 4)       # frame1 grid x
    w.u(4, 4)       # frame1 grid y
    w.u(0, 8)       # reserved
    w.flag(True)    # persistence
    w.flag(False)   # upsampled_aspect_ratio
    f = S.parse_sei_payload(_msg(S.SEI_FRAME_PACKING, w))
    assert f.arrangement_id == 7 and f.arrangement_type == 3
    assert f.frame0_grid_position == (1, 2)
    assert f.frame1_grid_position == (3, 4)
    assert f.persistence and f.current_frame_is_frame0


def test_360_payloads():
    # equirectangular
    w = BitWriter()
    w.flag(False)   # cancel
    w.flag(True)    # persistence
    w.flag(True)    # guard band
    w.u(0, 2)
    w.u(2, 3)       # guard_band_type
    w.u(8, 8)       # left width
    w.u(16, 8)      # right width
    e = S.parse_sei_payload(_msg(S.SEI_EQUIRECTANGULAR_PROJECTION, w))
    assert e.guard_band and e.left_guard_band_width == 8
    # sphere rotation (signed 32-bit)
    w = BitWriter()
    w.flag(False)
    w.flag(True)
    w.u(0, 6)
    w.u((1 << 32) - 100, 32)   # yaw = -100
    w.u(200, 32)               # pitch
    w.u(0, 32)                 # roll
    s = S.parse_sei_payload(_msg(S.SEI_SPHERE_ROTATION, w))
    assert s.yaw == -100 and s.pitch == 200 and s.roll == 0
    # omni viewport
    w = BitWriter()
    w.u(5, 10)      # id
    w.flag(False)   # cancel
    w.flag(True)    # persistence
    w.u(0, 4)       # cnt - 1
    for v in ((1 << 32) - 5, 6, 7, 8, 9):
        w.u(v, 32)
    o = S.parse_sei_payload(_msg(S.SEI_OMNI_VIEWPORT, w))
    assert o.viewport_id == 5 and o.viewports == [(-5, 6, 7, 8, 9)]
    # region-wise packing, one region with guard bands
    w = BitWriter()
    w.flag(False)   # cancel
    w.flag(True)    # persistence
    w.flag(False)   # constituent matching
    w.u(0, 5)
    w.u(1, 8)       # num regions
    w.u(3840, 32)
    w.u(1920, 32)
    w.u(1920, 16)
    w.u(1080, 16)
    w.u(0, 4)
    w.u(2, 3)       # transform type
    w.flag(True)    # guard band
    for v in (640, 480, 16, 32):
        w.u(v, 32)
    for v in (320, 240, 8, 4):
        w.u(v, 16)
    for v in (1, 2, 3, 4):
        w.u(v, 8)
    w.flag(True)    # not used for pred
    for v in (1, 1, 2, 2):
        w.u(v, 3)
    w.u(0, 3)
    p = S.parse_sei_payload(_msg(S.SEI_REGION_WISE_PACKING, w))
    assert p.proj_picture == (3840, 1920)
    assert len(p.regions) == 1
    assert p.regions[0].transform_type == 2
    assert p.regions[0].proj_region == (640, 480, 16, 32)
    assert p.regions[0].guard_band_widths == (1, 2, 3, 4)
    # generalized cubemap
    w = BitWriter()
    w.flag(False)
    w.flag(True)    # persistence
    w.u(0, 3)       # packing type -> 6 faces
    w.u(0, 2)       # mapping fn
    for i in range(6):
        w.u(i, 3)
        w.u(0, 2)
    w.flag(False)   # guard band
    g = S.parse_sei_payload(_msg(S.SEI_GENERALIZED_CUBEMAP_PROJECTION, w))
    assert g.face_index == [0, 1, 2, 3, 4, 5]


def test_sli_sari_atc_ave_ccv_psii_drap():
    # subpicture level info
    w = BitWriter()
    w.u(0, 3)       # num_ref_levels - 1
    w.flag(False)   # cbr
    w.flag(True)    # explicit fraction
    w.ue(1)         # num_subpics - 1 -> 2
    w.u(0, 3)       # max_sublayers - 1
    w.flag(False)   # sublayer info present
    w.byte_align(0)
    w.u(96, 8)      # non_subpic_layers_fraction
    w.u(83, 8)      # ref_level_idc
    w.u(50, 8)      # fraction subpic 0
    w.u(60, 8)      # fraction subpic 1
    s = S.parse_sei_payload(_msg(S.SEI_SUBPICTURE_LEVEL_INFO, w))
    assert s.num_subpics == 2
    assert s.ref_levels[(0, 0)] == (96, 83)
    assert s.ref_level_fraction[(0, 1, 0)] == 60
    # sample aspect ratio
    w = BitWriter()
    w.flag(False)
    w.flag(True)
    w.u(255, 8)
    w.u(4, 16)
    w.u(3, 16)
    sa = S.parse_sei_payload(_msg(S.SEI_SAMPLE_ASPECT_RATIO_INFO, w))
    assert (sa.sar_width, sa.sar_height) == (4, 3)
    # alternative transfer characteristics
    a = S.parse_sei_payload(S.SeiMessage(
        S.SEI_ALTERNATIVE_TRANSFER_CHARACTERISTICS, b"\x12"))
    assert a.preferred_transfer_characteristics == 18
    # ambient viewing environment
    w = BitWriter()
    w.u(31400, 32)
    w.u(15635, 16)
    w.u(16450, 16)
    av = S.parse_sei_payload(_msg(S.SEI_AMBIENT_VIEWING_ENVIRONMENT, w))
    assert av.ambient_illuminance == 31400
    assert av.ambient_light_x == 15635
    # content colour volume
    w = BitWriter()
    w.flag(False)   # cancel
    w.flag(True)    # persistence
    w.flag(True)    # primaries
    w.flag(True)    # min
    w.flag(False)   # max
    w.flag(False)   # avg
    for v in (100, 200, 300, 400, 500, 600):
        w.u(v, 32)
    w.u(10, 32)
    c = S.parse_sei_payload(_msg(S.SEI_CONTENT_COLOUR_VOLUME, w))
    assert c.primaries[2] == (500, 600)
    assert c.min_luminance == 10 and c.max_luminance is None
    # parameter sets inclusion indication
    w = BitWriter()
    w.flag(True)
    pi = S.parse_sei_payload(
        _msg(S.SEI_PARAMETER_SETS_INCLUSION_INDICATION, w))
    assert pi.self_contained_clvs
    # dependent RAP indication has no payload
    d = S.parse_sei_payload(S.SeiMessage(S.SEI_DEPENDENT_RAP_INDICATION,
                                         b""))
    assert isinstance(d, S.DependentRapIndication)


def _nested_subpic_dph(planes_views, bit_depth, subpic_id) -> S.SeiMessage:
    """Build a subpic-flagged scalable-nesting SEI nesting one DPH."""
    dph = S.make_dph_sei(planes_views, bit_depth, S.HASH_MD5)
    w = BitWriter()
    w.flag(False)   # ols_flag
    w.flag(True)    # subpic_flag
    w.flag(True)    # all_layers
    w.ue(0)         # num_subpics - 1
    w.ue(15)        # subpic_id_len - 1 -> 16
    w.u(subpic_id, 16)
    w.ue(0)         # num_seis - 1
    while w.bitpos % 8:
        w.u(1, 1)
    payload = bytearray(w.bytes())
    payload.append(dph.payload_type)
    payload.append(len(dph.payload))
    payload += dph.payload
    return S.SeiMessage(S.SEI_SCALABLE_NESTING, bytes(payload))


class TestSubpicDPH:
    def _decode(self, corrupt=False):
        import sys
        sys.path.insert(0, "tests")
        from test_subpics import _subpic_stream

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import StreamDecoder, parse_annexb
        from vvdec_tpu.testenc.hls_writer import make_nal

        stream = _subpic_stream(seed=3)
        # first decode without hashes to learn the plane content
        dec0 = StreamDecoder()
        pics = dec0.push(stream) + dec0.flush()
        planes = pics[0].planes
        # per-subpic nesting SEIs (subpics: 2 CTU-cols of 32 -> x split 64)
        seis = b""
        for idx, (x0, x1) in enumerate(((0, 64), (64, 128))):
            views = [planes[0][:, x0:x1]] + [
                p[:, x0 // 2: x1 // 2] for p in planes[1:]]
            m = _nested_subpic_dph(views, 10, subpic_id=idx)
            if corrupt and idx == 1:
                m = S.SeiMessage(m.payload_type,
                                 m.payload[:-1]
                                 + bytes([m.payload[-1] ^ 0xFF]))
            seis += make_nal(NalUnitType.SUFFIX_SEI,
                             S.write_sei_nal([m]))
        dec = StreamDecoder(strict_hash=True)
        out = dec.push(stream + seis)
        out += dec.flush()
        return dec, out

    def test_subpic_dph_verifies(self):
        dec, out = self._decode()
        assert len(out) == 1
        assert dec.hash_errors == 0

    def test_subpic_dph_mismatch_detected(self):
        with pytest.raises(ValueError, match="subpicture 1 hash"):
            self._decode(corrupt=True)
