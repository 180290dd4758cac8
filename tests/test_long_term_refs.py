"""Long-term reference pictures: LSB matching and MSB-cycle resolution
(Slice::constructRefPicLists + xGetLongTermRefPic), verified bit-exact
against the reference decoder."""

import os
import subprocess

import numpy as np
import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")


def _lt_stream(seed=11, msb_cycle=False):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import RefPicEntry, RefPicList
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(96, 64, long_term_ref_pics=True)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())

    dec = RandomDecisions(seed=seed, split_prob=0.3, inter_prob=0.7,
                          mv_range=24)
    nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
    stream += nal

    # P frame at POC 2 referencing POC 0 as a long-term picture
    rpl0 = RefPicList()
    e = RefPicEntry(is_long_term=True, value=0)
    if msb_cycle:
        e.delta_poc_msb_present = True
        e.delta_poc_msb_cycle = 0
    rpl0.entries.append(e)
    dec = RandomDecisions(seed=seed + 1, split_prob=0.3, inter_prob=0.7,
                          mv_range=24)
    nal, _ = E.encode_frame(
        sps, pps, dec, qp=32, poc=2, idr=False, slice_type=P_SLICE,
        ref_deltas=((2,), ()),
        sh_kw=dict(rpl=[rpl0, RefPicList()], rpl_idx=[-1, -1],
                   num_ref_idx_active=[1, 0]))
    stream += nal
    return stream


@pytest.mark.skipif(not os.path.exists(VVDECAPP),
                    reason="reference vvdecapp not built")
@pytest.mark.parametrize("msb_cycle", [False, True])
def test_long_term_ref_bit_exact(tmp_path, msb_cycle):
    from vvdec_tpu.decoder import decode_to_yuv
    stream = _lt_stream(msb_cycle=msb_cycle)
    bit = tmp_path / "lt.266"
    bit.write_bytes(stream)
    out = tmp_path / "ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert decode_to_yuv(stream) == out.read_bytes()
