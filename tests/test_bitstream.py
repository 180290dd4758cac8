"""Tests for the Annex-B / RBSP / bit-reader foundation layer."""

import pytest

from vvdec_tpu.bitstream import (
    BitReader,
    NalUnitType,
    ebsp_to_rbsp,
    parse_nal_header,
    read_nal_units,
    split_annexb,
)
from vvdec_tpu.bitstream.nal import rbsp_to_ebsp


class TestBitReader:
    def test_u(self):
        r = BitReader(bytes([0b10110011, 0b01000000]))
        assert r.u(1) == 1
        assert r.u(2) == 0b01
        assert r.u(5) == 0b10011
        assert r.u(2) == 0b01
        assert r.bits_left() == 6

    def test_u_cross_byte(self):
        r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
        assert r.u(24) == 0xABCDEF
        r = BitReader(bytes([0xAB, 0xCD, 0xEF]))
        assert r.u(4) == 0xA
        assert r.u(16) == 0xBCDE
        assert r.u(4) == 0xF

    def test_overrun(self):
        r = BitReader(b"\xff")
        r.u(8)
        with pytest.raises(EOFError):
            r.u(1)

    def test_ue(self):
        # codes: 1 -> 0; 010 -> 1; 011 -> 2; 00100 -> 3 ...
        def enc(bits: str) -> BitReader:
            pad = bits + "0" * (-len(bits) % 8)
            return BitReader(int(pad, 2).to_bytes(len(pad) // 8, "big"))

        assert enc("1").ue() == 0
        assert enc("010").ue() == 1
        assert enc("011").ue() == 2
        assert enc("00100").ue() == 3
        assert enc("00111").ue() == 6
        assert enc("0001000").ue() == 7

    def test_se(self):
        def enc(bits: str) -> BitReader:
            pad = bits + "0" * (-len(bits) % 8)
            return BitReader(int(pad, 2).to_bytes(len(pad) // 8, "big"))

        # k: 0,1,2,3,4 -> 0,1,-1,2,-2
        assert enc("1").se() == 0
        assert enc("010").se() == 1
        assert enc("011").se() == -1
        assert enc("00100").se() == 2
        assert enc("00101").se() == -2

    def test_align(self):
        r = BitReader(bytes([0xFF, 0x00]))
        r.u(3)
        assert not r.byte_aligned()
        r.align()
        assert r.byte_aligned()
        assert r.pos == 8

    def test_more_rbsp_data(self):
        # payload bits 1010 then stop bit 1 then alignment zeros: 10101000
        r = BitReader(bytes([0b10101000]))
        assert r.more_rbsp_data()
        r.u(4)
        assert not r.more_rbsp_data()


class TestAnnexB:
    def test_split_basic(self):
        buf = b"\x00\x00\x01AAAA\x00\x00\x00\x01BBB"
        spans = split_annexb(buf)
        assert [buf[o : o + s] for o, s in spans] == [b"AAAA", b"BBB"]

    def test_split_trailing_zero(self):
        # trailing zeros before next start code belong to the 4-byte start code
        buf = b"\x00\x00\x01AA\x00\x00\x00\x01BB"
        spans = split_annexb(buf)
        assert [buf[o : o + s] for o, s in spans] == [b"AA", b"BB"]

    def test_ebsp_roundtrip(self):
        payloads = [
            b"\x00\x00\x00\x00",
            b"\x00\x00\x01\x02\x03",
            b"\x00\x00\x02",
            b"\x00\x00\x03",
            b"hello\x00\x00\x00world",
            bytes(range(256)) * 3,
        ]
        for p in payloads:
            e = rbsp_to_ebsp(p)
            assert b"\x00\x00\x00" not in e
            assert b"\x00\x00\x01" not in e
            assert b"\x00\x00\x02" not in e
            assert ebsp_to_rbsp(e) == p

    def test_nal_header(self):
        # layer 0, SPS (15), tid 0: byte0 = 0, byte1 = 15<<3 | 1
        t, layer, tid = parse_nal_header(bytes([0x00, (15 << 3) | 1]))
        assert t == NalUnitType.SPS and layer == 0 and tid == 0

    def test_read_nal_units(self):
        payload = b"\x00\x00\x03\x01payload"  # contains EP byte
        nal = b"\x00\x00\x01" + bytes([0, (15 << 3) | 1]) + payload
        units = read_nal_units(nal)
        assert len(units) == 1
        assert units[0].nal_type == NalUnitType.SPS
        assert units[0].rbsp == b"\x00\x00\x01payload"
