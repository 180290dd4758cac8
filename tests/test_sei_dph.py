"""Decoded-picture-hash SEI: our hash computation must match vvdec's
(-dph verifies against the encoder-signalled hash) and our decoder must
self-verify."""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream_with_dph(seed, method, tmp_path):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.decoder import decode_annexb
    from vvdec_tpu.hls.sei import make_dph_sei, write_sei_nal
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(96, 64, temporal_mvp_enabled=True)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    head = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    head += make_nal(NalUnitType.PPS, w.bytes())

    nals = []
    for f in range(4):
        dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                              inter_prob=0.6, skip_prob=0.2, mv_range=40,
                              bi_prob=0.5)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=False,
                                    slice_type=1, ref_deltas=(d, ()))
        nals.append(nal)

    # first pass decode (without SEI) to get per-frame output planes
    frames = decode_annexb(head + b"".join(nals))

    # splice a suffix DPH SEI after each AU
    out = head
    for i, nal in enumerate(nals):
        out += nal
        sei = make_dph_sei(frames[i], sps.bit_depth, method)
        out += make_nal(NalUnitType.SUFFIX_SEI, write_sei_nal([sei]))
    return out


@pytest.mark.parametrize("method", [0, 1, 2])  # MD5, CRC, checksum
def test_dph_cross_check(method, tmp_path):
    from vvdec_tpu.decoder import decode_annexb

    stream = _stream_with_dph(method + 1, method, tmp_path)
    bit = tmp_path / "dph.266"
    bit.write_bytes(stream)
    r = subprocess.run(
        [VVDECAPP, "-b", str(bit), "-o", "/dev/null", "-t", "1", "-dph"],
        capture_output=True, text=True, timeout=120)
    assert "4 frames decoded" in r.stdout, r.stdout
    # vvdec prints the hash status per POC; any mismatch says "ERROR"
    assert "ERROR" not in r.stdout and "error" not in r.stdout, r.stdout
    assert "OK" in r.stdout or "ok" in r.stdout, r.stdout
    # our decoder self-verifies (raises on mismatch)
    decode_annexb(stream)
