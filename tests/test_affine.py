"""Oracle bit-exactness tests for affine motion (merge/AMVP/PROF) + SbTMVP."""

import hashlib
import os

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _stream(seed, n_frames, slice_type, sps_kw, dec_kw, deltas_fn=None):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    if deltas_fn is None:
        def deltas_fn(f):
            d = tuple(range(1, min(f, 2) + 1))
            return (d, d if slice_type == 0 else ())

    sps = E.make_sps(96, 64, **sps_kw)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
        else:
            nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f, idr=False,
                                    slice_type=slice_type,
                                    ref_deltas=deltas_fn(f))
        stream += nal
    return stream


def _check(stream, tmp_path, n_frames):
    from tests.test_oracle import ref_decode

    from vvdec_tpu.decoder import decode_to_yuv

    ref = ref_decode(stream, tmp_path, expect_frames=n_frames)
    out = decode_to_yuv(stream)
    assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest(), \
        "decoded YUV differs from reference"


class TestAffineAmvp:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_affine_amvp(self, seed, st, tmp_path):
        stream = _stream(
            seed, 4, st,
            dict(affine_enabled=True, affine_6param=seed % 2 == 0),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.1,
                 mv_range=32, bi_prob=0.5, affine_prob=0.7))
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(2))
    def test_affine_amvp_prof(self, seed, tmp_path):
        stream = _stream(
            seed, 4, seed % 2,
            dict(affine_enabled=True, affine_6param=True, prof_enabled=True),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.1,
                 mv_range=32, bi_prob=0.5, affine_prob=0.7))
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(2))
    def test_affine_amvr(self, seed, tmp_path):
        stream = _stream(
            seed, 4, seed % 2,
            dict(affine_enabled=True, affine_6param=True, amvr_enabled=True,
                 affine_amvr=True, prof_enabled=True),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.1,
                 mv_range=32, bi_prob=0.5, affine_prob=0.7,
                 affine_imv_prob=0.5, amvr_prob=0.3))
        _check(stream, tmp_path, 4)


class TestAffineMerge:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_affine_merge(self, seed, st, tmp_path):
        stream = _stream(
            seed, 5, st,
            dict(affine_enabled=True, affine_6param=True,
                 temporal_mvp_enabled=True, prof_enabled=seed % 2 == 0),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5, affine_prob=0.5,
                 affine_merge_prob=0.5))
        _check(stream, tmp_path, 5)


class TestSbTmvp:
    @pytest.mark.parametrize("seed,st", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_sbtmvp(self, seed, st, tmp_path):
        stream = _stream(
            seed, 5, st,
            dict(affine_enabled=seed % 2 == 0, affine_6param=True,
                 temporal_mvp_enabled=True, sbtmvp_enabled=True,
                 prof_enabled=seed % 2 == 0),
            dict(split_prob=0.3, inter_prob=0.8, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5, affine_prob=0.4,
                 affine_merge_prob=0.6))
        _check(stream, tmp_path, 5)


class TestAffineCombined:
    @pytest.mark.parametrize("seed", range(3))
    def test_all_inter_tools(self, seed, tmp_path):
        st = seed % 2
        stream = _stream(
            seed, 6, st,
            dict(affine_enabled=True, affine_6param=True, amvr_enabled=True,
                 affine_amvr=True, prof_enabled=True, sbtmvp_enabled=True,
                 temporal_mvp_enabled=True, mmvd_enabled=True,
                 bcw_enabled=True, smvd_enabled=st == 1, ciip_enabled=True,
                 sbt_enabled=True, gpm_enabled=st == 1,
                 max_num_gpm_cand=4 if st == 1 else 0),
            dict(split_prob=0.4, inter_prob=0.75, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5, affine_prob=0.4,
                 affine_merge_prob=0.4, affine_imv_prob=0.3, amvr_prob=0.3,
                 mmvd_prob=0.2, bcw_prob=0.3, smvd_prob=0.3, ciip_prob=0.2,
                 sbt_prob=0.3, geo_prob=0.2, max_gpm_cand=4))
        _check(stream, tmp_path, 6)
