"""Subpictures: layout parsing, one-slice-per-subpic mapping,
treated-as-picture MC clamping at subpic boundaries, deblock gating across
subpic edges — bit-exact vs the reference decoder (SubPic Slice.h:824,
clipMvInSubpic Mv.cpp:84, per-subpic ref extraction DecLibRecon.cpp:387)."""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _subpic_stream(seed, n_frames=1, inter=False, lf_across=True,
                   treated=True, mv_range=24):
    """128x64, 2 CTU-column subpics (each 2x2 CTUs of 32), one slice per
    subpic; frames after the IDR are P slices referencing the previous."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, I_SLICE, RandomDecisions, \
        make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(128, 64, ctu=32, num_subpics=2,
                     subpic_ctu_top_left=[(0, 0), (2, 0)],
                     subpic_size_ctus=[(2, 2), (2, 2)],
                     independent_subpics=False,
                     subpic_treated_as_pic=[treated, treated],
                     loop_filter_across_subpic=[lf_across, lf_across])
    sps.ptl.level_idc = 83  # room for the tile grid limits
    pps = E.make_pps(sps, no_pic_partition=False, num_exp_tile_cols=1,
                     num_exp_tile_rows=1, tile_col_widths=[2],
                     tile_row_heights=[2])
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        st = I_SLICE if f == 0 else P_SLICE
        slices = []
        for s in range(2):
            spec = dict(
                decisions=RandomDecisions(
                    seed=seed * 100 + f * 10 + s, split_prob=0.3,
                    density=0.1, inter_prob=0.8 if st == P_SLICE else 0.0,
                    mv_range=mv_range),
                slice_type=st)
            if st == P_SLICE:
                spec["ref_deltas"] = ((1,), ())
            slices.append(spec)
        nal, _ = E.encode_picture(sps, pps, qp=32, poc=f, idr=f == 0,
                                  slices=slices)
        stream += nal
    return stream


def _check(stream, tmp_path, name="sp"):
    from vvdec_tpu.decoder import decode_to_yuv
    bit = tmp_path / f"{name}.266"
    bit.write_bytes(stream)
    out = tmp_path / f"{name}_ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert decode_to_yuv(stream) == out.read_bytes()


@pytest.mark.parametrize("seed", [41, 42])
def test_subpic_intra_bit_exact(tmp_path, seed):
    _check(_subpic_stream(seed), tmp_path)


@pytest.mark.parametrize("seed", [43, 44])
def test_subpic_inter_treated_as_pic(tmp_path, seed):
    """Large MVs cross the subpic boundary: MC must clamp to the subpic
    (clipMvInSubpic) and replicate subpic edges in the gather."""
    _check(_subpic_stream(seed, n_frames=3, inter=True, mv_range=48),
           tmp_path)


@pytest.mark.parametrize("seed", [45])
def test_subpic_no_loopfilter_across(tmp_path, seed):
    """loop_filter_across_subpic off: the deblocker must not filter edges
    on the subpic boundary."""
    _check(_subpic_stream(seed, lf_across=False), tmp_path)


def test_subpic_layout_parsing():
    from vvdec_tpu.decoder import parse_annexb
    stream = _subpic_stream(46)
    f = parse_annexb(stream)[0]
    assert len(f.cs.subpics) == 2
    x0, y0, x1, y1, treated, lf = f.cs.subpics[1]
    assert (x0, y0, x1, y1) == (64, 0, 128, 64)
    assert treated
    assert f.cs.subpic_at(70, 10) is f.cs.subpics[1]


@pytest.mark.parametrize("lf_across", [False, True])
@pytest.mark.parametrize("seed", [47, 48])
def test_subpic_sao_across_boundary(tmp_path, seed, lf_across):
    """SAO trimming at subpic/slice boundaries follows the
    loop-filter-across flags (deriveLoopFilterBoundaryAvailibility)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import I_SLICE, RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(128, 64, ctu=32, num_subpics=2,
                     subpic_ctu_top_left=[(0, 0), (2, 0)],
                     subpic_size_ctus=[(2, 2), (2, 2)],
                     independent_subpics=False,
                     subpic_treated_as_pic=[True, True],
                     loop_filter_across_subpic=[lf_across, lf_across],
                     sao_enabled=True)
    sps.ptl.level_idc = 83
    pps = E.make_pps(sps, no_pic_partition=False, num_exp_tile_cols=1,
                     num_exp_tile_rows=1, tile_col_widths=[2],
                     tile_row_heights=[2])
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    slices = [dict(decisions=RandomDecisions(seed=seed * 10 + s,
                                             split_prob=0.3, density=0.1,
                                             sao_prob=0.9),
                   slice_type=I_SLICE,
                   sh_kw=dict(sao_enabled_luma=True,
                              sao_enabled_chroma=True))
              for s in range(2)]
    nal, _ = E.encode_picture(sps, pps, qp=32, poc=0, idr=True,
                              slices=slices)
    stream += nal
    _check(stream, tmp_path, f"sao{seed}{int(lf_across)}")


def _subpic_multislice_stream(seed, n_frames=2, mv_range=32):
    """128x128, 2 row-band subpics, each containing TWO tile-aligned rect
    slices (multi-slice-per-subpic: sh_slice_address indexes within the
    subpic, NumSlicesInSubpic > 1)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, I_SLICE, \
        RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(128, 128, ctu=32, num_subpics=2,
                     subpic_ctu_top_left=[(0, 0), (0, 2)],
                     subpic_size_ctus=[(4, 2), (4, 2)],
                     independent_subpics=False,
                     subpic_treated_as_pic=[True, True],
                     loop_filter_across_subpic=[False, False],
                     entry_point_offsets_present=True)
    sps.ptl.level_idc = 83
    pps = E.make_pps(sps, no_pic_partition=False, num_exp_tile_cols=2,
                     num_exp_tile_rows=2, tile_col_widths=[2, 2],
                     tile_row_heights=[2, 2], rect_slice=True,
                     single_slice_per_subpic=False, num_slices_in_pic=4,
                     slice_top_left_tile_idx=[0, 1, 2, 3],
                     slice_width_in_tiles=[1, 1, 1, 1],
                     slice_height_in_tiles=[1, 1, 1, 1])
    assert pps.slices_of_subpic == [[0, 1], [2, 3]]
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        st = I_SLICE if f == 0 else P_SLICE
        slices = []
        for s in range(4):
            spec = dict(
                decisions=RandomDecisions(
                    seed=seed * 100 + f * 10 + s, split_prob=0.3,
                    density=0.1, inter_prob=0.8 if st == P_SLICE else 0.0,
                    mv_range=mv_range),
                slice_type=st)
            if st == P_SLICE:
                spec["ref_deltas"] = ((1,), ())
            slices.append(spec)
        nal, _ = E.encode_picture(sps, pps, qp=32, poc=f, idr=f == 0,
                                  slices=slices)
        stream += nal
    return stream


@pytest.mark.parametrize("seed", [51, 52])
def test_subpic_multislice_intra(tmp_path, seed):
    _check(_subpic_multislice_stream(seed, n_frames=1), tmp_path, "msp")


@pytest.mark.parametrize("seed", [53])
def test_subpic_multislice_inter(tmp_path, seed):
    _check(_subpic_multislice_stream(seed, n_frames=3), tmp_path, "mspi")


@pytest.mark.parametrize("seed", [61, 62])
def test_subpic_gpm_treated_as_pic(tmp_path, seed):
    """GPM parts inside treated-as-pic subpics: each part's gather clamps
    to the subpic rectangle (clipMvInSubpic + subpic-edge replication)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import B_SLICE, I_SLICE, \
        RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(128, 64, ctu=32, num_subpics=2,
                     subpic_ctu_top_left=[(0, 0), (2, 0)],
                     subpic_size_ctus=[(2, 2), (2, 2)],
                     independent_subpics=False,
                     subpic_treated_as_pic=[True, True],
                     loop_filter_across_subpic=[False, False],
                     gpm_enabled=True, max_num_gpm_cand=4)
    sps.ptl.level_idc = 83
    pps = E.make_pps(sps, no_pic_partition=False, num_exp_tile_cols=1,
                     num_exp_tile_rows=1, tile_col_widths=[2],
                     tile_row_heights=[2])
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(3):
        st = I_SLICE if f == 0 else B_SLICE
        slices = []
        for s in range(2):
            spec = dict(
                decisions=RandomDecisions(
                    seed=seed * 100 + f * 10 + s, split_prob=0.3,
                    density=0.1, inter_prob=0.9 if st == B_SLICE else 0.0,
                    mv_range=48, bi_prob=0.5, geo_prob=0.5,
                    max_gpm_cand=4),
                slice_type=st)
            if st == B_SLICE:
                spec["ref_deltas"] = ((1,), (1,))
            slices.append(spec)
        nal, _ = E.encode_picture(sps, pps, qp=32, poc=f, idr=f == 0,
                                  slices=slices)
        stream += nal
    _check(stream, tmp_path, "gpmsp")
