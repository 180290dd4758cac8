"""Oracle bit-exactness tests for ALF + CC-ALF."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _alf_stream(seed, n_frames, slice_type, sps_kw, dec_kw, n_aps=2,
                cc=True, ctu=32, wh=(96, 64)):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_alf_aps
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=ctu, alf_enabled=True,
                     ccalf_enabled=cc, **sps_kw)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    apss = {}
    for i in range(n_aps):
        aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=cc)
        apss[i] = aps
        stream += nal
    sh_kw = dict(alf_enabled=[True, True, True],
                 num_alf_aps_ids_luma=n_aps,
                 alf_aps_ids_luma=list(range(n_aps)),
                 alf_aps_id_chroma=0)
    if cc:
        cb_ok = apss[0].cc_alf.new_filter[0]
        cr_ok = apss[n_aps - 1].cc_alf.new_filter[1]
        sh_kw.update(ccalf_cb_enabled=cb_ok, ccalf_cb_aps_id=0,
                     ccalf_cr_enabled=cr_ok, ccalf_cr_aps_id=n_aps - 1)
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0 or slice_type == 2:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True,
                                    sh_kw=sh_kw, alf_apss=apss)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type, sh_kw=sh_kw, alf_apss=apss,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestAlfIntra:
    @pytest.mark.parametrize("seed", range(3))
    def test_alf_luma_fixed_only(self, seed, tmp_path):
        # no APS luma filters referenced -> only fixed filter sets
        stream = _alf_stream(seed, 2, 2, {}, dict(split_prob=0.4),
                             n_aps=1, cc=False)
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed", range(4))
    def test_alf_full(self, seed, tmp_path):
        stream = _alf_stream(seed, 2, 2, {},
                             dict(split_prob=0.4, jccr_prob=0.2), n_aps=3)
        _check(stream, tmp_path, 2)

    def test_alf_ctu128(self, tmp_path):
        stream = _alf_stream(11, 2, 2, {}, dict(split_prob=0.4),
                             n_aps=2, ctu=128, wh=(160, 128))
        _check(stream, tmp_path, 2)

    def test_alf_odd_size(self, tmp_path):
        # picture not a CTU multiple: bottom/right partial CTUs
        stream = _alf_stream(13, 2, 2, {}, dict(split_prob=0.4),
                             n_aps=2, wh=(80, 48))
        _check(stream, tmp_path, 2)


class TestAlfInter:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_alf_inter(self, seed, st, tmp_path):
        stream = _alf_stream(
            seed, 4, st, dict(temporal_mvp_enabled=True),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5), n_aps=2)
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(2))
    def test_alf_with_sao_lmcs(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import make_lmcs_aps
        # combine the three in-loop stages: deblock + SAO + ALF, plus LMCS
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions, make_alf_aps
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        sps = E.make_sps(96, 64, alf_enabled=True, ccalf_enabled=True,
                         sao_enabled=True, lmcs_enabled=True,
                         temporal_mvp_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        apss = {}
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i)
            apss[i] = aps
            stream += nal
        _, lmcs_nal = make_lmcs_aps(seed)
        stream += lmcs_nal
        sh_kw = dict(alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                     alf_aps_id_chroma=1,
                     ccalf_cb_enabled=apss[0].cc_alf.new_filter[0],
                     ccalf_cb_aps_id=0,
                     ccalf_cr_enabled=apss[0].cc_alf.new_filter[1],
                     ccalf_cr_aps_id=0,
                     sao_enabled_luma=True, sao_enabled_chroma=True)
        ph_kw = dict(lmcs_enabled=True, lmcs_aps_id=0,
                     chroma_residual_scale=True)
        for f in range(4):
            dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                                  inter_prob=0.7, skip_prob=0.2,
                                  mv_range=40, bi_prob=0.5, sao_prob=0.4)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0,
                                        idr=True, sh_kw=sh_kw, ph_kw=ph_kw,
                                        alf_apss=apss)
            else:
                d = tuple(range(1, min(f, 2) + 1))
                nal, _ = E.encode_frame(
                    sps, pps, dec, qp=32, poc=f, idr=False, slice_type=1,
                    sh_kw=sh_kw, ph_kw=ph_kw, alf_apss=apss,
                    ref_deltas=(d, ()))
            stream += nal
        _check(stream, tmp_path, 4)


class TestAlfAcrossBoundaries:
    """ALF clipping at slice/tile boundaries with loop_filter_across* = 0
    (AdaptiveLoopFilter.cpp:176-265 clipTop/Bottom/Left/Right)."""

    def _stream(self, seed, pps_kw, n_frames=2, wh=(96, 64), ctu=32):
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import (RandomDecisions,
                                               encode_picture, make_alf_aps,
                                               make_nal)
        from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

        sps = E.make_sps(wh[0], wh[1], ctu=ctu, alf_enabled=True,
                         ccalf_enabled=True, entry_point_offsets_present=True)
        sps.ptl.level_idc = 83
        pps = E.make_pps(sps, **pps_kw)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        apss = {}
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
            apss[i] = aps
            stream += nal
        sh_kw = dict(alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2,
                     alf_aps_ids_luma=[0, 1], alf_aps_id_chroma=0)
        if apss[0].cc_alf.new_filter[0]:
            sh_kw.update(ccalf_cb_enabled=True, ccalf_cb_aps_id=0)
        if apss[1].cc_alf.new_filter[1]:
            sh_kw.update(ccalf_cr_enabled=True, ccalf_cr_aps_id=1)
        n_slices = pps_kw.get("num_slices_in_pic", 1)
        for f in range(n_frames):
            if n_slices > 1:
                slices = [dict(decisions=RandomDecisions(
                                   seed=seed * 100 + f * 10 + i,
                                   split_prob=0.4),
                               slice_type=2, sh_kw=dict(sh_kw))
                          for i in range(n_slices)]
                nal, _ = encode_picture(sps, pps, poc=f, idr=True,
                                        slices=slices, alf_apss=apss)
            else:
                dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4)
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f,
                                        idr=True, sh_kw=sh_kw,
                                        alf_apss=apss)
            stream += nal
        return stream

    TILES = dict(no_pic_partition=False, num_exp_tile_cols=2,
                 num_exp_tile_rows=2, tile_col_widths=[2, 1],
                 tile_row_heights=[1, 1], rect_slice=True,
                 single_slice_per_subpic=True)

    @pytest.mark.parametrize("seed", range(3))
    def test_alf_tiles_no_across(self, seed, tmp_path):
        pps_kw = dict(self.TILES, loop_filter_across_tiles=False)
        _check(self._stream(seed, pps_kw), tmp_path, 2)

    @pytest.mark.parametrize("seed", range(3))
    def test_alf_slices_no_across(self, seed, tmp_path):
        pps_kw = dict(self.TILES, single_slice_per_subpic=False,
                      num_slices_in_pic=4,
                      slice_top_left_tile_idx=[0, 1, 2, 3],
                      slice_width_in_tiles=[1, 1, 1, 1],
                      slice_height_in_tiles=[1, 1, 1, 1],
                      loop_filter_across_slices=False,
                      loop_filter_across_tiles=True)
        _check(self._stream(seed, pps_kw), tmp_path, 2)

    def test_alf_tiles_across_enabled_unchanged(self, tmp_path):
        # control: across enabled must keep filtering over the boundary
        pps_kw = dict(self.TILES, loop_filter_across_tiles=True)
        _check(self._stream(7, pps_kw), tmp_path, 2)


class TestVectorizedAlf:
    """alf_frame_vec (the host fast path) == alf_frame (per-block golden)
    on decoded pictures, and classify_frame == per-block classify."""

    def test_vec_matches_golden(self):
        import numpy as np
        from vvdec_tpu.decoder import StreamDecoder
        from vvdec_tpu.frame.alf_np import alf_frame, alf_frame_vec
        from vvdec_tpu.frame import alf_np
        s = _alf_stream(7, 2, 2, {}, dict(split_prob=0.5, jccr_prob=0.2),
                        n_aps=3)
        captured = []
        orig = alf_np.alf_frame_vec

        def spy(cs, planes):
            captured.append((cs, [p.copy() for p in planes]))
            return orig(cs, planes)

        import vvdec_tpu.decoder as D
        alf_np.alf_frame_vec = spy
        # decoder imports the symbol at call time from the module
        try:
            dec = StreamDecoder()
            dec.push(s)
            dec.flush()
        finally:
            alf_np.alf_frame_vec = orig
        assert captured
        for cs, planes in captured:
            a = alf_frame(cs, [p.copy() for p in planes])
            b = orig(cs, [p.copy() for p in planes])
            for x, y in zip(a, b):
                assert np.array_equal(x, y)

    def test_classify_frame_matches_golden(self):
        import numpy as np
        from vvdec_tpu.frame.alf_np import classify, classify_frame
        rng = np.random.default_rng(11)
        for bd, hw in ((10, (64, 96)), (8, (128, 64))):
            src = rng.integers(0, 1 << bd, hw).astype(np.int32)
            c1, t1 = classify(src, 0, 0, hw[1], hw[0], bd, 64, 60)
            c2, t2 = classify_frame(src, bd, 64, 60)
            assert np.array_equal(c1, c2) and np.array_equal(t1, t2)


class TestRasterSliceAlfPad:
    """rasterSliceAlfPad (AdaptiveLoopFilter.cpp:262-289): raster-scan
    slices with loop-filter-across-slices off pad the 4x4 corner where
    only the diagonal-neighbour CTU belongs to another slice."""

    def _stream(self, seed, split):
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import (RandomDecisions,
                                               encode_picture,
                                               make_alf_aps, make_nal)
        from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

        sps = E.make_sps(96, 96, ctu=32, alf_enabled=True,
                         ccalf_enabled=True, sao_enabled=True,
                         entry_point_offsets_present=True)
        sps.ptl.level_idc = 83
        pps = E.make_pps(sps, no_pic_partition=False,
                         num_exp_tile_cols=3, num_exp_tile_rows=3,
                         tile_col_widths=[1, 1, 1],
                         tile_row_heights=[1, 1, 1],
                         rect_slice=False,
                         loop_filter_across_slices=False,
                         loop_filter_across_tiles=True)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        apss = {}
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
            apss[i] = aps
            stream += nal
        sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True,
                     alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                     alf_aps_id_chroma=0)
        if apss[0].cc_alf.new_filter[0]:
            sh_kw.update(ccalf_cb_enabled=True, ccalf_cb_aps_id=0)
        # split = (n_tiles_slice0): 1 -> top-left corner pad at CTU (1,1);
        # 8 -> bottom-right corner pad at CTU (1,1)
        slices = []
        for i, (addr, n) in enumerate(((0, split), (split, 9 - split))):
            slices.append(dict(
                decisions=RandomDecisions(seed=seed * 100 + i,
                                          split_prob=0.4, density=0.2,
                                          sao_prob=0.5),
                slice_type=2, address=addr, num_tiles=n, sh_kw=sh_kw))
        for f in range(2):
            nal, _ = encode_picture(sps, pps, poc=f, idr=True,
                                    slices=slices, alf_apss=apss)
            stream += nal
        return stream

    @pytest.mark.parametrize("seed", range(2))
    @pytest.mark.parametrize("split", [1, 8])
    def test_raster_alf_corner_pad(self, seed, split, tmp_path):
        import subprocess
        from vvdec_tpu.decoder import decode_to_yuv
        stream = self._stream(seed, split)
        bit = tmp_path / "rp.266"
        bit.write_bytes(stream)
        out = tmp_path / "rp.yuv"
        r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out),
                            "-t", "1"], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert decode_to_yuv(stream) == out.read_bytes()
