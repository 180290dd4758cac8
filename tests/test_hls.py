"""HLS writer->reader round-trip tests."""

import dataclasses

from vvdec_tpu.hls import SPS, PPS, ChromaQpTable, parse_pps, parse_sps
from vvdec_tpu.testenc.bitwriter import BitWriter
from vvdec_tpu.testenc.hls_writer import write_pps, write_sps


def make_test_sps(width=64, height=64, ctu=32, **kw) -> SPS:
    sps = SPS()
    sps.pic_width_max = width
    sps.pic_height_max = height
    sps.ctu_size = ctu
    sps.ptl.level_idc = 16
    sps.bit_depth = 10
    sps.max_dec_pic_buffering = [8]
    sps.num_reorder_pics = [0]
    sps.max_latency_increase_plus1 = [0]
    sps.log2_min_cb_size = 2
    # no-split config: minQT = CTU, no MTT
    sps.min_qt_size = [ctu, ctu, ctu]
    sps.max_mtt_depth = [0, 0, 0]
    sps.max_bt_size = [ctu, ctu, ctu]
    sps.max_tt_size = [ctu, ctu, ctu]
    sps.chroma_qp_table = ChromaQpTable.default(sps.qp_bd_offset)
    for k, v in kw.items():
        setattr(sps, k, v)
    return sps


def make_test_pps(sps: SPS, **kw) -> PPS:
    pps = PPS()
    pps.pic_width = sps.pic_width_max
    pps.pic_height = sps.pic_height_max
    for k, v in kw.items():
        setattr(pps, k, v)
    pps.finalize(sps)
    return pps


def mk_rbsp(writer_fn) -> bytes:
    w = BitWriter()
    w.u(0, 16)  # placeholder NAL header (parser skips 16 bits)
    writer_fn(w)
    return w.bytes()


class TestSpsRoundTrip:
    def test_basic(self):
        sps = make_test_sps()
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        assert got.pic_width_max == 64 and got.pic_height_max == 64
        assert got.ctu_size == 32
        assert got.bit_depth == 10
        # chroma (index 2) constraints are only signalled for dual-tree intra
        assert got.min_qt_size == [32, 32, 0]
        assert got.max_mtt_depth == [0, 0, 0]
        assert not got.sao_enabled and not got.alf_enabled
        assert got.chroma_format_idc == 1
        assert got.log2_max_poc_lsb == 8
        assert got.max_dec_pic_buffering == [8]

    def test_tools_flags(self):
        sps = make_test_sps(
            sao_enabled=True,
            alf_enabled=True,
            ccalf_enabled=True,
            lmcs_enabled=True,
            transform_skip_enabled=True,
            bdpcm_enabled=True,
            mts_enabled=True,
            explicit_mts_intra=True,
            lfnst_enabled=True,
            joint_cbcr_enabled=True,
            isp_enabled=True,
            mrl_enabled=True,
            mip_enabled=True,
            cclm_enabled=True,
            dep_quant_enabled=True,
            temporal_mvp_enabled=True,
            sbtmvp_enabled=True,
            amvr_enabled=True,
            bdof_enabled=True,
            dmvr_enabled=True,
            mmvd_enabled=True,
            affine_enabled=True,
            affine_6param=True,
            prof_enabled=True,
            bcw_enabled=True,
            ciip_enabled=True,
            gpm_enabled=True,
            max_num_gpm_cand=5,
            sbt_enabled=True,
            ibc_enabled=True,
        )
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        for f in ("sao_enabled", "alf_enabled", "ccalf_enabled", "lmcs_enabled",
                  "transform_skip_enabled", "bdpcm_enabled", "mts_enabled",
                  "lfnst_enabled", "joint_cbcr_enabled", "isp_enabled", "mrl_enabled",
                  "mip_enabled", "cclm_enabled", "dep_quant_enabled",
                  "temporal_mvp_enabled", "sbtmvp_enabled", "amvr_enabled",
                  "bdof_enabled", "dmvr_enabled", "mmvd_enabled", "affine_enabled",
                  "prof_enabled", "bcw_enabled", "ciip_enabled", "gpm_enabled",
                  "sbt_enabled", "ibc_enabled"):
            assert getattr(got, f) == getattr(sps, f), f
        assert got.max_num_gpm_cand == 5

    def test_partition_sizes(self):
        sps = make_test_sps(
            ctu=64,
            min_qt_size=[8, 8, 8],
            max_mtt_depth=[2, 2, 2],
            max_bt_size=[32, 32, 32],
            max_tt_size=[32, 32, 32],
            dual_tree_intra=True,
        )
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        assert got.min_qt_size == [8, 8, 8]
        assert got.max_mtt_depth == [2, 2, 2]
        assert got.max_bt_size == [32, 32, 32]
        assert got.max_tt_size == [32, 32, 32]
        assert got.dual_tree_intra


class TestPpsRoundTrip:
    def test_basic(self):
        sps = make_test_sps()
        pps = make_test_pps(sps, init_qp=30)
        rbsp = mk_rbsp(lambda w: write_pps(w, pps, sps))
        got = parse_pps(rbsp, lambda _id: sps)
        assert got.pic_width == 64 and got.pic_height == 64
        assert got.init_qp == 30
        assert got.no_pic_partition
        assert got.num_tiles == 1
        assert got.pic_width_in_ctu == 2 and got.pic_height_in_ctu == 2
        assert got.slice_maps == [[0, 1, 2, 3]]

    def test_tiles(self):
        sps = make_test_sps(width=256, height=128, ctu=32)
        pps = make_test_pps(
            sps,
            no_pic_partition=False,
            num_exp_tile_cols=1,
            num_exp_tile_rows=1,
            tile_col_widths=[4],
            tile_row_heights=[2],
            rect_slice=True,
            single_slice_per_subpic=True,
            loop_filter_across_tiles=True,
            loop_filter_across_slices=True,
        )
        # reset derived fields mutated by finalize so writer sees originals
        pps.tile_col_widths = [4]
        pps.tile_row_heights = [2]
        rbsp = mk_rbsp(lambda w: write_pps(w, pps, sps))
        got = parse_pps(rbsp, lambda _id: sps)
        assert got.num_tile_cols == 2 and got.num_tile_rows == 2
        assert got.tile_col_bd == [0, 4, 8]
        assert got.tile_row_bd == [0, 2, 4]

    def test_chroma_qp_offsets(self):
        sps = make_test_sps(joint_cbcr_enabled=True)
        pps = make_test_pps(
            sps,
            chroma_tool_offsets_present=True,
            cb_qp_offset=1,
            cr_qp_offset=-1,
            joint_cbcr_qp_offset_present=True,
            joint_cbcr_qp_offset=2,
            slice_chroma_qp_offsets_present=True,
        )
        rbsp = mk_rbsp(lambda w: write_pps(w, pps, sps))
        got = parse_pps(rbsp, lambda _id: sps)
        assert got.cb_qp_offset == 1 and got.cr_qp_offset == -1
        assert got.joint_cbcr_qp_offset == 2
        assert got.slice_chroma_qp_offsets_present


class TestChromaQpTable:
    def test_default_monotone(self):
        t = ChromaQpTable.default(12)
        # identity-ish: qp 30 maps near 30
        assert abs(t.map_qp(0, 30) - 30) <= 1
        assert t.map_qp(0, 63) <= 63


class TestHrdParams:
    """general/ols_timing_hrd_parameters (spec 7.3.5; reference
    HLSyntaxReader::parseGeneralHrdParameters/parseOlsHrdParameters)."""

    HRD = {
        "num_units_in_tick": 1001, "time_scale": 60000,
        "nal_hrd": True, "vcl_hrd": False,
        "same_pic_timing_in_all_ols": True, "du_hrd": False,
        "bit_rate_scale": 4, "cpb_size_scale": 2, "cpb_cnt": 2,
        "ols": {"sublayers": {0: {
            "fixed_pic_rate_general": True,
            "fixed_pic_rate_within_cvs": True,
            "elemental_duration_in_tc": 1,
            "nal": [
                {"bit_rate_value": 100, "cpb_size_value": 200,
                 "cbr": False},
                {"bit_rate_value": 300, "cpb_size_value": 200,
                 "cbr": True},
            ]}}},
    }

    def test_roundtrip(self):
        sps = make_test_sps()
        sps.timing_hrd_params_present = True
        sps.hrd_params = dict(self.HRD)
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        h = got.hrd_params
        assert h["num_units_in_tick"] == 1001
        assert h["time_scale"] == 60000
        assert h["nal_hrd"] and not h["vcl_hrd"]
        assert h["cpb_cnt"] == 2
        sl = h["ols"]["sublayers"][0]
        assert sl["fixed_pic_rate_within_cvs"]
        assert sl["elemental_duration_in_tc"] == 1
        assert sl["nal"][1] == {"bit_rate_value": 300,
                                "cpb_size_value": 200, "cbr": True}
        # tool flags after the HRD block must parse undisturbed
        assert got.pic_width_max == 64 and got.bit_depth == 10

    def test_low_delay_single_cpb(self):
        """low_delay_hrd_flag is present only with signalled NAL/VCL HRD
        and hrd_cpb_cnt_minus1 == 0 (HLSyntaxReader.cpp:1288-1293)."""
        sps = make_test_sps()
        sps.timing_hrd_params_present = True
        sps.hrd_params = {
            "num_units_in_tick": 1, "time_scale": 25,
            "nal_hrd": True, "vcl_hrd": False, "du_hrd": False,
            "same_pic_timing_in_all_ols": False,
            "bit_rate_scale": 0, "cpb_size_scale": 0, "cpb_cnt": 1,
            "ols": {"sublayers": {0: {
                "fixed_pic_rate_general": False,
                "fixed_pic_rate_within_cvs": False,
                "low_delay_hrd": True,
                "nal": [{"bit_rate_value": 5, "cpb_size_value": 6,
                         "cbr": False}]}}},
        }
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        sl = got.hrd_params["ols"]["sublayers"][0]
        assert sl["low_delay_hrd"] is True
        assert got.hrd_params["time_scale"] == 25

    def test_no_nal_vcl_no_low_delay_flag(self):
        """With neither NAL nor VCL HRD signalled, no low_delay flag is
        coded (inferred 0) and parsing resumes cleanly after the block."""
        sps = make_test_sps()
        sps.timing_hrd_params_present = True
        sps.hrd_params = {
            "num_units_in_tick": 1, "time_scale": 25,
            "nal_hrd": False, "vcl_hrd": False, "du_hrd": False,
            "ols": {"sublayers": {0: {
                "fixed_pic_rate_general": False,
                "fixed_pic_rate_within_cvs": False}}},
        }
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        sl = got.hrd_params["ols"]["sublayers"][0]
        assert "low_delay_hrd" not in sl
        assert got.pic_width_max == 64


class TestVuiParams:
    """vui_parameters (spec 7.3.6; reference HLSyntaxReader::parseVUI
    HLSyntaxReader.cpp:1082)."""

    def test_roundtrip(self):
        sps = make_test_sps()
        sps.vui_present = True
        sps.vui = {
            "progressive_source": True, "interlaced_source": False,
            "non_packed_constraint": False,
            "non_projected_constraint": True,
            "aspect_ratio_constant": True, "aspect_ratio_idc": 255,
            "sar_width": 4, "sar_height": 3,
            "colour_primaries": 9, "transfer_characteristics": 16,
            "matrix_coeffs": 9, "full_range": False,
            "chroma_sample_loc_type": 2,
        }
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        v = got.vui
        assert v["progressive_source"] and not v["interlaced_source"]
        assert v["sar_width"] == 4 and v["sar_height"] == 3
        assert v["colour_primaries"] == 9
        assert v["transfer_characteristics"] == 16
        assert v["matrix_coeffs"] == 9
        assert v["chroma_sample_loc_type"] == 2
        assert got.pic_width_max == 64  # SPS tail parses undisturbed

    def test_fixed_sar_table(self):
        sps = make_test_sps()
        sps.vui_present = True
        sps.vui = {"aspect_ratio_idc": 14}  # 4:3 from the fixed table
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        assert got.vui["sar_width"] == 4 and got.vui["sar_height"] == 3

    def test_interlaced_chroma_loc(self):
        sps = make_test_sps()
        sps.vui_present = True
        sps.vui = {
            "progressive_source": False, "interlaced_source": True,
            "chroma_sample_loc_type_top": 1,
            "chroma_sample_loc_type_bottom": 3,
        }
        rbsp = mk_rbsp(lambda w: write_sps(w, sps))
        got = parse_sps(rbsp)
        assert got.vui["chroma_sample_loc_type_top"] == 1
        assert got.vui["chroma_sample_loc_type_bottom"] == 3
