"""Oracle bit-exactness tests for LMCS (luma mapping + chroma scaling)."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _lmcs_stream(seed, n_frames, slice_type, sps_kw, dec_kw, chroma_scale,
                 ctu=32, wh=(96, 64)):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_lmcs_aps
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], ctu=ctu, lmcs_enabled=True, **sps_kw)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    _, aps_nal = make_lmcs_aps(seed)
    stream += aps_nal
    ph_kw = dict(lmcs_enabled=True, lmcs_aps_id=0,
                 chroma_residual_scale=chroma_scale)
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0 or slice_type == 2:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=True,
                                    ph_kw=ph_kw)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type, ph_kw=ph_kw,
                ref_deltas=(d, d if slice_type == 0 else ()))
        stream += nal
    return stream


class TestLmcsIntra:
    @pytest.mark.parametrize("seed", range(3))
    def test_intra_luma_mapping(self, seed, tmp_path):
        stream = _lmcs_stream(seed, 2, 2, {},
                              dict(split_prob=0.4, isp_prob=0.2,
                                   mip_prob=0.2), chroma_scale=False)
        _check(stream, tmp_path, 2)

    @pytest.mark.parametrize("seed", range(3))
    def test_intra_chroma_scaling(self, seed, tmp_path):
        stream = _lmcs_stream(seed, 2, 2, {},
                              dict(split_prob=0.4, jccr_prob=0.3),
                              chroma_scale=True)
        _check(stream, tmp_path, 2)

    def test_ctu128_vpdu(self, tmp_path):
        stream = _lmcs_stream(9, 2, 2, {}, dict(split_prob=0.4),
                              chroma_scale=True, ctu=128, wh=(160, 128))
        _check(stream, tmp_path, 2)


class TestLmcsInter:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_inter_fwd_mapping(self, seed, st, tmp_path):
        stream = _lmcs_stream(
            seed, 4, st, dict(temporal_mvp_enabled=True),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5), chroma_scale=True)
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(2))
    def test_lmcs_all_tools(self, seed, tmp_path):
        st = seed % 2
        stream = _lmcs_stream(
            seed, 5, st,
            dict(temporal_mvp_enabled=True, affine_enabled=True,
                 affine_6param=True, prof_enabled=True, sbtmvp_enabled=True,
                 mmvd_enabled=True, bcw_enabled=True, ciip_enabled=True,
                 sbt_enabled=True, gpm_enabled=st == 1,
                 max_num_gpm_cand=4 if st == 1 else 0),
            dict(split_prob=0.4, inter_prob=0.75, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5, affine_prob=0.3,
                 affine_merge_prob=0.3, mmvd_prob=0.2, bcw_prob=0.3,
                 ciip_prob=0.25, sbt_prob=0.25, geo_prob=0.2,
                 max_gpm_cand=4, jccr_prob=0.25), chroma_scale=True)
        _check(stream, tmp_path, 5)
