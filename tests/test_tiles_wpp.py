"""Oracle bit-exactness tests for tiles and WPP (entropy sync)."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream(seed, n_frames, slice_type, sps_kw, pps_kw, dec_kw,
            wh=(96, 64), ctu=32):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=ctu, entry_point_offsets_present=True,
                     **sps_kw)
    sps.ptl.level_idc = 83  # level 5.1: room for the tile grid limits
    pps = E.make_pps(sps, **pps_kw)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0 or slice_type == 2:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


TILES_2X2 = dict(no_pic_partition=False, num_exp_tile_cols=2,
                 num_exp_tile_rows=2, tile_col_widths=[2, 1],
                 tile_row_heights=[1, 1], rect_slice=True,
                 single_slice_per_subpic=True)


class TestTiles:
    @pytest.mark.parametrize("seed", range(3))
    def test_tiles_intra(self, seed, tmp_path):
        stream = _stream(seed, 2, 2, {}, TILES_2X2, dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 0)])
    def test_tiles_inter(self, seed, st, tmp_path):
        stream = _stream(
            seed, 4, st, dict(temporal_mvp_enabled=True), TILES_2X2,
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5))
        _check(stream, tmp_path, 4)

    def test_tiles_4x1_wide(self, tmp_path):
        pps_kw = dict(no_pic_partition=False, num_exp_tile_cols=4,
                      num_exp_tile_rows=1, tile_col_widths=[1, 1, 1, 1],
                      tile_row_heights=[2], rect_slice=True,
                      single_slice_per_subpic=True)
        stream = _stream(7, 2, 2, {}, pps_kw, dict(split_prob=0.5),
                         wh=(128, 64))
        _check(stream, tmp_path, 2)


class TestWpp:
    @pytest.mark.parametrize("seed", range(3))
    def test_wpp_intra(self, seed, tmp_path):
        stream = _stream(seed, 2, 2,
                         dict(entropy_coding_sync_enabled=True), {},
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 0)])
    def test_wpp_inter(self, seed, st, tmp_path):
        stream = _stream(
            seed, 4, st,
            dict(entropy_coding_sync_enabled=True,
                 temporal_mvp_enabled=True), {},
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5))
        _check(stream, tmp_path, 4)

    def test_wpp_with_tiles(self, tmp_path):
        stream = _stream(5, 2, 2,
                         dict(entropy_coding_sync_enabled=True), TILES_2X2,
                         dict(split_prob=0.5))
        _check(stream, tmp_path, 2)
