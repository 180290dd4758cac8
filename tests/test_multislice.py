"""Oracle bit-exactness tests for multi-slice pictures (PH NAL + N slices)."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")

TILES_2X2 = dict(no_pic_partition=False, num_exp_tile_cols=2,
                 num_exp_tile_rows=2, tile_col_widths=[2, 1],
                 tile_row_heights=[1, 1])


def _header(sps_kw, pps_kw, wh=(96, 64), ctu=32):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=ctu,
                     entry_point_offsets_present=True, **sps_kw)
    sps.ptl.level_idc = 83
    pps = E.make_pps(sps, **pps_kw)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    return sps, pps, stream


def _slices(n, base_seed, dec_kw, types=None, ref_deltas=((1,), ()),
            **extra):
    from vvdec_tpu.testenc.encoder import RandomDecisions
    out = []
    for i in range(n):
        spec = dict(decisions=RandomDecisions(seed=base_seed + i, **dec_kw),
                    **extra)
        t = 2 if types is None else types[i]
        spec["slice_type"] = t
        if t != 2:
            spec["ref_deltas"] = (ref_deltas[0],
                                  ref_deltas[1] if t == 0 else ())
        out.append(spec)
    return out


class TestRectMultiSlice:
    @pytest.mark.parametrize("seed", range(3))
    def test_four_slices_intra(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=4,
                      slice_top_left_tile_idx=[0, 1, 2, 3],
                      slice_width_in_tiles=[1, 1, 1, 1],
                      slice_height_in_tiles=[1, 1, 1, 1],
                      loop_filter_across_slices=seed % 2 == 0,
                      loop_filter_across_tiles=seed % 2 == 0)
        sps, pps, stream = _header({}, pps_kw)
        for f in range(2):
            nal, _ = encode_picture(
                sps, pps, poc=f, idr=True,
                slices=_slices(4, seed * 100 + f * 10, dict(split_prob=0.5)))
            stream += nal
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed", range(2))
    def test_two_wide_slices_inter(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=2,
                      slice_top_left_tile_idx=[0, 2],
                      slice_width_in_tiles=[2, 2],
                      slice_height_in_tiles=[1, 1],
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header(dict(temporal_mvp_enabled=True), pps_kw)
        dec_kw = dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                      mv_range=24, bi_prob=0.5)
        for f in range(4):
            if f == 0:
                sl = _slices(2, seed * 100, dict(split_prob=0.5))
            else:
                d = tuple(range(1, min(f, 2) + 1))
                sl = _slices(2, seed * 100 + f * 10, dec_kw,
                             types=[1, 1], ref_deltas=(d, ()))
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0, slices=sl)
            stream += nal
        _check(stream, tmp_path, 4)

    def test_mixed_slice_types(self, tmp_path):
        # one P slice and one I slice in the same picture
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=2,
                      slice_top_left_tile_idx=[0, 2],
                      slice_width_in_tiles=[2, 2],
                      slice_height_in_tiles=[1, 1],
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header({}, pps_kw)
        for f in range(3):
            if f == 0:
                sl = _slices(2, 5, dict(split_prob=0.5))
            else:
                sl = _slices(2, 50 + f * 10,
                             dict(split_prob=0.4, inter_prob=0.7,
                                  mv_range=24),
                             types=[1, 2], ref_deltas=((1,), ()))
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0, slices=sl)
            stream += nal
        _check(stream, tmp_path, 3)


class TestRasterMultiSlice:
    @pytest.mark.parametrize("seed", range(2))
    def test_raster_two_slices(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=False,
                      loop_filter_across_slices=seed % 2 == 0,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header({}, pps_kw)
        for f in range(2):
            sl = _slices(2, seed * 100 + f * 10, dict(split_prob=0.5))
            sl[0]["address"], sl[0]["num_tiles"] = 0, 3
            sl[1]["address"], sl[1]["num_tiles"] = 3, 1
            nal, _ = encode_picture(sps, pps, poc=f, idr=True, slices=sl)
            stream += nal
        _check(stream, tmp_path, 2)


class TestPerSliceRpl:
    """Slices of one picture with DIFFERING reference picture lists
    (Slice::constructRefPicLists is per slice; the ref sets swap per CU
    and the colocated-MV POC lookup is slice-aware)."""

    @pytest.mark.parametrize("seed", range(2))
    def test_differing_rpls(self, tmp_path, seed):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=2,
                      slice_top_left_tile_idx=[0, 2],
                      slice_width_in_tiles=[2, 2],
                      slice_height_in_tiles=[1, 1],
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header(dict(temporal_mvp_enabled=True), pps_kw)
        dec_kw = dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                      mv_range=24)
        for f in range(5):
            if f == 0:
                sl = _slices(2, seed * 100, dict(split_prob=0.5))
            elif f == 1:
                sl = _slices(2, seed * 100 + f * 10, dec_kw, types=[1, 1],
                             ref_deltas=((1,), ()))
            else:
                # same reference set, opposite order: ref_idx 0 resolves
                # to POC f-1 in slice 0 but POC f-2 in slice 1
                sl = _slices(1, seed * 100 + f * 10, dec_kw, types=[1],
                             ref_deltas=((1, 2), ()))
                sl += _slices(1, seed * 100 + f * 10 + 5, dec_kw,
                              types=[1],
                              ref_deltas=((2, 1), ()))
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0,
                                    slices=sl)
            stream += nal
        _check(stream, tmp_path, 5)

    def test_per_slice_rpl_flag_and_census(self):
        from vvdec_tpu.api import Decoder, DecoderParams
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=2,
                      slice_top_left_tile_idx=[0, 2],
                      slice_width_in_tiles=[2, 2],
                      slice_height_in_tiles=[1, 1],
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header({}, pps_kw)
        dec_kw = dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                      mv_range=16)
        for f in range(3):
            if f == 0:
                sl = _slices(2, 7, dict(split_prob=0.5))
            elif f == 1:
                sl = _slices(2, 7 + f * 10, dec_kw, types=[1, 1],
                             ref_deltas=((1,), ()))
            else:
                sl = _slices(1, 7 + f * 10, dec_kw, types=[1],
                             ref_deltas=((1, 2), ()))
                sl += _slices(1, 7 + f * 10 + 5, dec_kw, types=[1],
                              ref_deltas=((2, 1), ()))
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0,
                                    slices=sl)
            stream += nal
        d = Decoder(DecoderParams())
        frames = d.decode(stream)
        frames += d.flush()
        assert len(frames) == 3
        census = d.get_fallback_census()
        assert census.get("inter_c:per_slice_rpl", 0) >= 1, census


class TestParallelSliceParse:
    """threads >= 3 parses each slice of a multi-slice picture as its
    own walk-pool task over private record buffers (DecLibParser's
    per-slice parse tasks); results must be bit-identical to the serial
    parse."""

    def _both(self, stream, n):
        import numpy as np
        from vvdec_tpu.decoder import StreamDecoder, decode_annexb
        ser = decode_annexb(stream)
        d = StreamDecoder(threads=4)
        par = d.push(stream)
        par += d.flush()
        assert len(ser) == len(par) == n
        for fs, fp in zip(ser, par):
            for a, b in zip(fs, fp.planes):
                assert np.array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("seed", range(2))
    def test_four_slices_inter_parallel(self, seed):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=4,
                      slice_top_left_tile_idx=[0, 1, 2, 3],
                      slice_width_in_tiles=[1, 1, 1, 1],
                      slice_height_in_tiles=[1, 1, 1, 1],
                      loop_filter_across_slices=seed % 2 == 0,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header(dict(temporal_mvp_enabled=True),
                                   pps_kw)
        dec_kw = dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                      mv_range=24)
        for f in range(4):
            if f == 0:
                sl = _slices(4, seed * 100 + f * 10, dict(split_prob=0.5))
            else:
                d = tuple(range(1, min(f, 2) + 1))
                sl = _slices(4, seed * 100 + f * 10, dec_kw,
                             types=[1] * 4, ref_deltas=(d, ()))
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0,
                                    slices=sl)
            stream += nal
        self._both(stream, 4)

    def test_raster_slices_parallel(self):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=False,
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header({}, pps_kw)
        for f in range(2):
            sl = _slices(2, 7 + f * 10, dict(split_prob=0.5))
            sl[0]["address"], sl[0]["num_tiles"] = 0, 3
            sl[1]["address"], sl[1]["num_tiles"] = 3, 1
            nal, _ = encode_picture(sps, pps, poc=f, idr=True, slices=sl)
            stream += nal
        self._both(stream, 2)

    def test_mixed_slice_types_parallel(self):
        from vvdec_tpu.testenc.encoder import encode_picture
        pps_kw = dict(**TILES_2X2, rect_slice=True,
                      single_slice_per_subpic=False, num_slices_in_pic=2,
                      slice_top_left_tile_idx=[0, 2],
                      slice_width_in_tiles=[2, 2],
                      slice_height_in_tiles=[1, 1],
                      loop_filter_across_slices=True,
                      loop_filter_across_tiles=True)
        sps, pps, stream = _header({}, pps_kw)
        dec_kw = dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                      mv_range=16)
        for f in range(3):
            if f == 0:
                sl = _slices(2, 21, dict(split_prob=0.5))
            else:
                sl = _slices(1, 22 + f, dec_kw, types=[1],
                             ref_deltas=((1,), ()))
                sl += _slices(1, 25 + f, dict(split_prob=0.5), types=[2])
            nal, _ = encode_picture(sps, pps, poc=f, idr=f == 0,
                                    slices=sl)
            stream += nal
        self._both(stream, 3)
