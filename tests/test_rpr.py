"""RPR (reference picture resampling): scaled-reference MC via scaling
windows, verified bit-exact against the reference decoder
(xPredInterBlkRPR, CU::getRprScaling)."""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _rpr_stream(seed, win=None, n_inter=2, w=96, h=64, inter_size=None):
    """IDR at full size; P frames under a PPS with a different scaling
    window and/or picture size -> every reference is scaled (isRefScaled).
    The conformance constraint curW*maxW >= refW*(curPicW - 8) caps
    window-only ratios near 1.09x, so larger ratios use a smaller inter
    picture size (res_change_in_clvs)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(w, h, rpr_enabled=True,
                     res_change_in_clvs_allowed=inter_size is not None)
    pps0 = E.make_pps(sps)
    kw = {}
    if win is not None:
        kw["scaling_win"] = win
    if inter_size is not None:
        kw["pic_width"], kw["pic_height"] = inter_size
    pps1 = E.make_pps(sps, pps_id=1, **kw)
    bw = BitWriter()
    write_sps(bw, sps)
    stream = make_nal(NalUnitType.SPS, bw.bytes())
    for p in (pps0, pps1):
        bw = BitWriter()
        write_pps(bw, p, sps)
        stream += make_nal(NalUnitType.PPS, bw.bytes())

    dec = RandomDecisions(seed=seed, split_prob=0.3, inter_prob=0.8,
                          mv_range=24)
    nal, _ = E.encode_frame(sps, pps0, dec, qp=32, poc=0, idr=True)
    stream += nal
    for i in range(1, n_inter + 1):
        dec = RandomDecisions(seed=seed + i, split_prob=0.3, inter_prob=0.8,
                              mv_range=24)
        nal, _ = E.encode_frame(sps, pps1, dec, qp=32, poc=i, idr=False,
                                slice_type=P_SLICE, ref_deltas=((i,), ()))
        stream += nal
    return stream


@pytest.mark.parametrize("win,inter_size", [
    ((2, 2, 2, 2), None),   # ~1.09x: standard filters, stepped positions
    (None, (64, 48)),       # 1.5x/1.33x: RPR1 filter set (res change)
    (None, (48, 32)),       # 2x: RPR2 filter set (res change)
])
@pytest.mark.parametrize("seed", [21, 22])
def test_rpr_scaled_refs_bit_exact(tmp_path, win, inter_size, seed):
    from vvdec_tpu.decoder import decode_to_yuv
    stream = _rpr_stream(seed, win, inter_size=inter_size)
    bit = tmp_path / "rpr.266"
    bit.write_bytes(stream)
    out = tmp_path / "ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert decode_to_yuv(stream) == out.read_bytes()


def test_rpr_scaling_ratio_math():
    from vvdec_tpu.frame.rpr_np import get_rpr_scaling, is_ref_scaled
    from vvdec_tpu.testenc import encoder as E
    sps = E.make_sps(96, 64)
    pps0 = E.make_pps(sps)
    pps1 = E.make_pps(sps, pps_id=1, scaling_win=(12, 12, 8, 8))
    assert not is_ref_scaled(pps0, pps0)
    assert is_ref_scaled(pps1, pps0)
    sx, sy = get_rpr_scaling(sps, pps1, pps0)
    # cur 96-48=48 wide vs ref 96 -> 2x
    assert sx == (96 << 14) // 48


@pytest.mark.parametrize("seed", [31, 32])
def test_rpr_affine_bit_exact(tmp_path, seed):
    """Affine subblock MC with scaled refs: 6-tap base + affine RPR filter
    sets, PROF disabled (xPredAffineBlk RPR branch)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(96, 64, rpr_enabled=True,
                     res_change_in_clvs_allowed=True, affine_enabled=True)
    pps0 = E.make_pps(sps)
    pps1 = E.make_pps(sps, pps_id=1, pic_width=64, pic_height=48)
    bw = BitWriter()
    write_sps(bw, sps)
    stream = make_nal(NalUnitType.SPS, bw.bytes())
    for p in (pps0, pps1):
        bw = BitWriter()
        write_pps(bw, p, sps)
        stream += make_nal(NalUnitType.PPS, bw.bytes())
    dec = RandomDecisions(seed=seed, split_prob=0.3, inter_prob=0.8,
                          mv_range=24)
    nal, _ = E.encode_frame(sps, pps0, dec, qp=32, poc=0, idr=True)
    stream += nal
    for i in (1, 2):
        dec = RandomDecisions(seed=seed + i, split_prob=0.3, inter_prob=0.8,
                              mv_range=24, affine_prob=0.8,
                              aff_mv_range=16)
        nal, _ = E.encode_frame(sps, pps1, dec, qp=32, poc=i, idr=False,
                                slice_type=P_SLICE, ref_deltas=((i,), ()))
        stream += nal
    bit = tmp_path / "rpr_aff.266"
    bit.write_bytes(stream)
    out = tmp_path / "ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert decode_to_yuv(stream) == out.read_bytes()


@pytest.mark.parametrize("seed", [31, 32])
def test_rpr_with_gpm(tmp_path, seed):
    """GPM partitions with scaled references: each geo part routes through
    RPR interpolation (motionCompensationGeo -> xPredInterUni)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import B_SLICE, RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(96, 64, rpr_enabled=True,
                     res_change_in_clvs_allowed=True,
                     gpm_enabled=True, max_num_gpm_cand=4)
    pps0 = E.make_pps(sps)
    pps1 = E.make_pps(sps, pps_id=1, pic_width=64, pic_height=48)
    bw = BitWriter()
    write_sps(bw, sps)
    stream = make_nal(NalUnitType.SPS, bw.bytes())
    for p in (pps0, pps1):
        bw = BitWriter()
        write_pps(bw, p, sps)
        stream += make_nal(NalUnitType.PPS, bw.bytes())
    dec = RandomDecisions(seed=seed, split_prob=0.3, inter_prob=0.8,
                          mv_range=24)
    nal, _ = E.encode_frame(sps, pps0, dec, qp=32, poc=0, idr=True)
    stream += nal
    for i in range(1, 3):
        dec = RandomDecisions(seed=seed + i, split_prob=0.3, inter_prob=0.9,
                              mv_range=24, bi_prob=0.5, geo_prob=0.5,
                              max_gpm_cand=4)
        nal, _ = E.encode_frame(sps, pps1, dec, qp=32, poc=i, idr=False,
                                slice_type=B_SLICE,
                                ref_deltas=((i,), (i,)))
        stream += nal
    bit = tmp_path / "rprgeo.266"
    bit.write_bytes(stream)
    out = tmp_path / "ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert decode_to_yuv(stream) == out.read_bytes()
