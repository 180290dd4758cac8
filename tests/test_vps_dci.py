"""VPS / DCI NAL parsing and activation checks.

Parity targets: DecLibParser::xDecodeDCI (DecLibParser.cpp:1536-1551),
VPS activation checks (DecLibParser.cpp:453-476), NAL-unit constraint
gating (DecLib::xCheckNalUnitConstraintFlags, DecLib.cpp:669-695).
"""

import os
import subprocess

import pytest

from vvdec_tpu.bitstream.nal import NalUnitType
from vvdec_tpu.decoder import FrameParser, decode_to_yuv
from vvdec_tpu.hls.reader import HlsError, parse_dci, parse_vps
from vvdec_tpu.testenc.bitwriter import BitWriter
from vvdec_tpu.testenc.encoder import generate_stream, make_sps
from vvdec_tpu.testenc.hls_writer import make_nal, write_dci, write_vps

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")


def _dci_nal(sps) -> bytes:
    w = BitWriter()
    write_dci(w, sps)
    return make_nal(NalUnitType.DCI, w.bytes())


def _vps_nal(sps, vps_id=1) -> bytes:
    w = BitWriter()
    write_vps(w, sps, vps_id=vps_id)
    return make_nal(NalUnitType.VPS, w.bytes())


def _rbsp_of(nal_bytes: bytes) -> bytes:
    """Annex-B NAL -> full RBSP (2-byte header + payload, de-escaped)."""
    from vvdec_tpu.bitstream.nal import read_nal_units
    (nal,) = read_nal_units(nal_bytes)
    return bytes([0, (int(nal.nal_type) << 3) | (nal.temporal_id + 1)]) \
        + nal.rbsp


class TestParse:
    def test_dci_roundtrip(self):
        sps = make_sps(64, 64)
        dci = parse_dci(_rbsp_of(_dci_nal(sps)))
        assert len(dci.ptls) == 1
        assert dci.ptls[0].profile_idc == sps.ptl.profile_idc
        assert dci.ptls[0].level_idc == sps.ptl.level_idc

    def test_vps_roundtrip(self):
        sps = make_sps(64, 64)
        vps = parse_vps(_rbsp_of(_vps_nal(sps, vps_id=3)))
        assert vps.vps_id == 3
        assert vps.max_layers == 1
        assert vps.max_sublayers == 1
        assert vps.independent_layer == [True]
        assert len(vps.ptls) == 1
        assert vps.ptls[0].level_idc == sps.ptl.level_idc

    def test_vps_id_zero_rejected(self):
        sps = make_sps(64, 64)
        rbsp = bytearray(_rbsp_of(_vps_nal(sps, vps_id=1)))
        rbsp[2] &= 0x0F  # vps_video_parameter_set_id -> 0
        with pytest.raises(HlsError):
            parse_vps(bytes(rbsp))


class TestStream:
    def test_vps_dci_stream_decodes(self):
        plain, _ = generate_stream(width=64, height=64, seed=4)
        with_ps, _ = generate_stream(width=64, height=64, seed=4,
                                     with_vps_dci=True)
        assert decode_to_yuv(with_ps) == decode_to_yuv(plain)

    def test_duplicate_dci_identical_ok(self):
        sps = make_sps(64, 64)
        stream, _ = generate_stream(width=64, height=64, seed=4)
        decode_to_yuv(_dci_nal(sps) + _dci_nal(sps) + stream)

    def test_duplicate_dci_mismatch_rejected(self):
        sps = make_sps(64, 64)
        a = _dci_nal(sps)
        sps2 = make_sps(64, 64)
        sps2.ptl.level_idc = 16
        b = _dci_nal(sps2)
        stream, _ = generate_stream(width=64, height=64, seed=4)
        with pytest.raises(HlsError):
            decode_to_yuv(a + b + stream)

    def test_dci_nonzero_temporal_id_rejected(self):
        sps = make_sps(64, 64)
        w = BitWriter()
        write_dci(w, sps)
        bad = make_nal(NalUnitType.DCI, w.bytes(), temporal_id=1)
        stream, _ = generate_stream(width=64, height=64, seed=4)
        with pytest.raises(ValueError):
            decode_to_yuv(bad + stream)


class TestActivation:
    def test_missing_vps_rejected(self):
        stream, _ = generate_stream(width=64, height=64, seed=4)
        fp = FrameParser()
        from vvdec_tpu.bitstream.nal import read_nal_units
        nals = list(read_nal_units(stream))
        with pytest.raises(ValueError, match="no VPS"):
            for nal in nals:
                fp.feed_nal(nal)
                if nal.nal_type == NalUnitType.SPS:
                    fp.psman.sps[0].vps_id = 1

    def test_present_vps_accepted(self):
        sps_w = make_sps(64, 64)
        stream, _ = generate_stream(width=64, height=64, seed=4)
        fp = FrameParser()
        from vvdec_tpu.bitstream.nal import read_nal_units
        frames = []
        for nal in read_nal_units(_vps_nal(sps_w, vps_id=1) + stream):
            frames.extend(fp.feed_nal(nal))
            if nal.nal_type == NalUnitType.SPS:
                fp.psman.sps[0].vps_id = 1
        fp._flush_pending(frames)
        assert len(frames) == 1

    def test_gci_nal_constraint(self):
        from vvdec_tpu.hls.params import ConstraintInfo, ProfileTierLevel, SPS
        fp = FrameParser()
        sps = SPS()
        ci = ConstraintInfo(gci_present_flag=True, flags={"no_aps": True})
        sps.ptl = ProfileTierLevel(constraint_info=ci)
        fp.active_sps = sps
        with pytest.raises(ValueError, match="no_aps"):
            fp._check_nal_constraints(NalUnitType.PREFIX_APS)
        fp._check_nal_constraints(NalUnitType.TRAIL)  # not constrained


@pytest.mark.skipif(not os.path.exists(VVDECAPP),
                    reason="reference vvdecapp not built")
class TestOracle:
    def test_vps_dci_stream_in_reference(self, tmp_path):
        stream, _ = generate_stream(width=64, height=64, seed=4,
                                    with_vps_dci=True)
        bit = tmp_path / "t.266"
        yuv = tmp_path / "t.yuv"
        bit.write_bytes(stream)
        r = subprocess.run(
            [VVDECAPP, "-b", str(bit), "-o", str(yuv), "-t", "1"],
            capture_output=True, text=True, timeout=120)
        assert "1 frames decoded" in r.stdout, r.stdout + r.stderr
        import hashlib
        assert hashlib.md5(yuv.read_bytes()).hexdigest() \
            == hashlib.md5(decode_to_yuv(stream)).hexdigest()
