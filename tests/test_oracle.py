"""Oracle tests: generated streams must decode in the reference vvdec binary.

Skipped when the binary is absent; build it per .claude/skills/verify/SKILL.md.
"""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def ref_decode(stream: bytes, tmp_path, expect_frames: int = 1) -> bytes:
    bit = tmp_path / "t.266"
    yuv = tmp_path / "t.yuv"
    bit.write_bytes(stream)
    r = subprocess.run(
        [VVDECAPP, "-b", str(bit), "-o", str(yuv), "-t", "1"],
        capture_output=True, text=True, timeout=120)
    assert f"{expect_frames} frames decoded" in r.stdout, r.stdout + r.stderr
    assert "ERROR" not in r.stdout, r.stdout
    return yuv.read_bytes()


class TestOracleAccepts:
    @pytest.mark.parametrize("seed", range(3))
    def test_splits(self, seed, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    dec_kw=dict(split_prob=0.6))
        ref_decode(stream, tmp_path)

    def test_ctu128_and_boundary(self, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=144, height=96, ctu=128, seed=5,
                                    dec_kw=dict(split_prob=0.4))
        ref_decode(stream, tmp_path)

    def test_multi_frame(self, tmp_path):
        from vvdec_tpu.testenc.encoder import generate_stream
        stream, _ = generate_stream(width=64, height=64, n_frames=3, seed=2)
        ref_decode(stream, tmp_path, expect_frames=3)


def md5_compare(tmp_path, **kw):
    import hashlib

    import numpy as np

    from vvdec_tpu.decoder import decode_to_yuv
    from vvdec_tpu.testenc.encoder import generate_stream

    stream, _ = generate_stream(**kw)
    ref = ref_decode(stream, tmp_path, expect_frames=kw.get("n_frames", 1))
    out = decode_to_yuv(stream)
    assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest(), \
        "decoded YUV differs from reference"


class TestBitExactRecon:
    """Full decode (parse + intra recon) must match the reference bit-exactly."""

    @pytest.mark.parametrize("seed", range(4))
    def test_intra_random(self, seed, tmp_path):
        md5_compare(tmp_path, width=64, height=64, seed=seed,
                    dec_kw=dict(split_prob=0.5))

    def test_boundary_and_ctu128(self, tmp_path):
        md5_compare(tmp_path, width=80, height=48, seed=11,
                    dec_kw=dict(split_prob=0.4))
        md5_compare(tmp_path, width=128, height=128, ctu=128, seed=12,
                    dec_kw=dict(split_prob=0.4))

    @pytest.mark.parametrize("qp", [5, 27, 51])
    def test_qp_extremes(self, qp, tmp_path):
        md5_compare(tmp_path, width=64, height=64, seed=qp, qp=qp,
                    dec_kw=dict(split_prob=0.4))

    def test_multi_frame(self, tmp_path):
        md5_compare(tmp_path, width=64, height=64, n_frames=3, seed=9,
                    dec_kw=dict(split_prob=0.5))


class TestToolsBitExact:
    """Transform/residual tool combinations vs the reference."""

    @pytest.mark.parametrize("seed", range(4))
    def test_combined_tools(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        class AllDec(RandomDecisions):
            def bdpcm_mode(self, cu, ch):
                return self.rnd.choice([0, 0, 1, 2])

            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.3

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

            def mts_idx(self, cu):
                return self.rnd.choice([0, 0, 2, 3, 4, 5])

        sps = E.make_sps(64, 64, transform_skip_enabled=True, bdpcm_enabled=True,
                         log2_max_ts_size=4, lfnst_enabled=True, mts_enabled=True,
                         explicit_mts_intra=True,
                         dep_quant_enabled=seed % 2 == 0,
                         sign_data_hiding_enabled=seed % 4 >= 2)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        dec = AllDec(seed=seed, split_prob=0.5, density=0.15, max_level=30)
        sh_kw = dict(dep_quant_used=seed % 2 == 0,
                     sign_data_hiding_used=seed % 4 >= 2 and seed % 2 == 1)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, sh_kw=sh_kw)
        stream += nal
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestMrlCclmBitExact:
    """MRL and CCLM intra tools vs the reference decoder."""

    @pytest.mark.parametrize("seed", range(3))
    def test_mrl(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    sps_kw=dict(mrl_enabled=True),
                                    dec_kw=dict(split_prob=0.5, mrl_prob=0.5))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    @pytest.mark.parametrize("seed,collocated", [(0, True), (1, True),
                                                 (2, False), (3, False)])
    def test_cclm(self, seed, collocated, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(
            width=64, height=64, seed=seed,
            sps_kw=dict(cclm_enabled=True,
                        chroma_ver_collocated=collocated),
            dec_kw=dict(split_prob=0.5))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestIspBitExact:
    """ISP (intra sub-partitions) incl. sub-4x4 partitions, pred regions,
    implicit DST7, LFNST-with-ISP, and deblocking of sub-grid TU edges."""

    @pytest.mark.parametrize("seed", range(4))
    def test_isp(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    sps_kw=dict(isp_enabled=True),
                                    dec_kw=dict(split_prob=0.5, isp_prob=0.6))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    @pytest.mark.parametrize("seed", range(4))
    def test_isp_all_tools(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        class AllDec(RandomDecisions):
            def bdpcm_mode(self, cu, ch):
                return self.rnd.choice([0, 0, 0, 1, 2])

            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.25

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

        sps = E.make_sps(96, 64, isp_enabled=True, lfnst_enabled=True,
                         mts_enabled=True, transform_skip_enabled=True,
                         bdpcm_enabled=True, log2_max_ts_size=4,
                         explicit_mts_intra=seed % 3 == 0,
                         mrl_enabled=True, cclm_enabled=True,
                         dep_quant_enabled=seed % 2 == 0)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        dec = AllDec(seed=seed, split_prob=0.5, density=0.2, max_level=30,
                     isp_prob=0.5, mrl_prob=0.3)
        nal, _ = E.encode_frame(sps, pps, dec, qp=28 + seed % 10,
                                sh_kw=dict(dep_quant_used=seed % 2 == 0))
        stream += nal
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestMipBitExact:
    """MIP (matrix intra prediction) vs the reference decoder."""

    @pytest.mark.parametrize("seed", range(4))
    def test_mip(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    sps_kw=dict(mip_enabled=True),
                                    dec_kw=dict(split_prob=0.5, mip_prob=0.6))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestDualTreeJccrBitExact:
    """Global dual-tree intra, joint Cb-Cr, and their interaction with the
    full intra toolset (CTU 32 and 64)."""

    @pytest.mark.parametrize("seed", range(3))
    def test_jccr(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(width=64, height=64, seed=seed,
                                    sps_kw=dict(joint_cbcr_enabled=True),
                                    ph_kw=dict(joint_cbcr_sign=bool(seed % 2)),
                                    dec_kw=dict(split_prob=0.5, jccr_prob=0.6))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    @pytest.mark.parametrize("seed,ctu", [(0, 32), (1, 64), (2, 32), (3, 64)])
    def test_dual_tree_all_tools(self, seed, ctu, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        class AllDec(RandomDecisions):
            def use_ts(self, tu, cu, comp):
                return self.rnd.random() < 0.2

            def lfnst_idx(self, cu):
                return self.rnd.choice([0, 1, 2])

        sps = E.make_sps(96, 64, ctu=ctu, dual_tree_intra=True,
                         cclm_enabled=True, mip_enabled=True, isp_enabled=True,
                         lfnst_enabled=True, mts_enabled=True,
                         transform_skip_enabled=True, log2_max_ts_size=4,
                         mrl_enabled=True, joint_cbcr_enabled=True,
                         min_qt_size=[8, 8, 8], max_mtt_depth=[2, 2, 2],
                         max_bt_size=[32, 32, 32], max_tt_size=[32, 32, 32])
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        dec = AllDec(seed=seed, split_prob=0.5, density=0.2, max_level=30,
                     isp_prob=0.35, mrl_prob=0.25, mip_prob=0.35,
                     jccr_prob=0.4)
        nal, _ = E.encode_frame(sps, pps, dec, qp=30,
                                ph_kw=dict(joint_cbcr_sign=bool(seed % 2)))
        stream += nal
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestSaoBitExact:
    """SAO (band + all 4 edge-offset classes, merges) vs the reference."""

    @pytest.mark.parametrize("seed", range(4))
    def test_sao(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc.encoder import generate_stream

        stream, _ = generate_stream(
            width=96, height=64, seed=seed,
            sps_kw=dict(sao_enabled=True),
            sh_kw=dict(sao_enabled_luma=True,
                       sao_enabled_chroma=seed % 3 != 0),
            dec_kw=dict(split_prob=0.4, sao_prob=0.7))
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


def _inter_stream(seed, n_frames, slice_type, deltas_fn, dec_kw, qp=32,
                  sao=False):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import RandomDecisions
    from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

    sps = E.make_sps(96, 64, sao_enabled=sao)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True) if sao else {}
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dec_kw)
        if f == 0:
            nal, _ = E.encode_frame(sps, pps, dec, qp=qp, poc=0, idr=True,
                                    sh_kw=sh_kw)
        else:
            nal, _ = E.encode_frame(sps, pps, dec, qp=qp, poc=f, idr=False,
                                    slice_type=slice_type,
                                    ref_deltas=deltas_fn(f), sh_kw=sh_kw)
        stream += nal
    return stream


class TestInterBitExact:
    """P/B slices: merge/skip/AMVP motion, MC interpolation, HMVP,
    inter deblocking, SAO on inter frames."""

    @pytest.mark.parametrize("seed", range(3))
    def test_p_slices(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import P_SLICE

        stream = _inter_stream(
            seed, 4, P_SLICE, lambda f: ((1,), ()),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2, mv_range=40))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    @pytest.mark.parametrize("seed", range(3))
    def test_b_slices(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import B_SLICE

        stream = _inter_stream(
            seed, 4, B_SLICE,
            lambda f: (tuple(range(1, min(f, 2) + 1)),
                       tuple(range(1, min(f, 2) + 1))),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=32, bi_prob=0.5))
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    @pytest.mark.parametrize("seed", range(2))
    def test_p_with_sao(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import P_SLICE

        stream = _inter_stream(
            seed, 3, P_SLICE, lambda f: ((1,), ()),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=32, sao_prob=0.6), sao=True)
        ref = ref_decode(stream, tmp_path, expect_frames=3)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestTmvpBitExact:
    """Temporal MVP (collocated MV scaling, C0/C1 positions)."""

    @pytest.mark.parametrize("seed,slice_type", [(0, 1), (1, 1), (2, 0), (3, 0)])
    def test_tmvp(self, seed, slice_type, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        sps = E.make_sps(96, 64, temporal_mvp_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(5):
            dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                                  inter_prob=0.75, skip_prob=0.25,
                                  mv_range=48, bi_prob=0.5)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
            else:
                d = tuple(range(1, min(f, 2) + 1))
                nal, _ = E.encode_frame(
                    sps, pps, dec, qp=32, poc=f, idr=False,
                    slice_type=slice_type,
                    ref_deltas=(d, d if slice_type == 0 else ()))
            stream += nal
        ref = ref_decode(stream, tmp_path, expect_frames=5)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestInterToolsBitExact:
    """AMVR (incl. alt half-pel IF), MMVD, BCW, SMVD, TMVP combined."""

    @pytest.mark.parametrize("seed", range(4))
    def test_inter_tools(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import B_SLICE, P_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        st = B_SLICE if seed % 2 else P_SLICE
        sps = E.make_sps(96, 64, amvr_enabled=True, mmvd_enabled=True,
                         bcw_enabled=True, smvd_enabled=st == B_SLICE,
                         temporal_mvp_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(5):
            dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                                  inter_prob=0.75, skip_prob=0.25,
                                  mv_range=48, bi_prob=0.5, amvr_prob=0.4,
                                  mmvd_prob=0.3, bcw_prob=0.4, smvd_prob=0.4)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
            else:
                d = tuple(range(1, min(f, 2) + 1))
                nal, _ = E.encode_frame(
                    sps, pps, dec, qp=32, poc=f, idr=False, slice_type=st,
                    ref_deltas=(d, d if st == B_SLICE else ()))
            stream += nal
        ref = ref_decode(stream, tmp_path, expect_frames=5)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestCiipSbtBitExact:
    """CIIP blending and SBT transforms combined with other inter tools."""

    @pytest.mark.parametrize("seed", range(4))
    def test_ciip_sbt(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import B_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        sps = E.make_sps(96, 64, ciip_enabled=True, sbt_enabled=True,
                         bcw_enabled=True, amvr_enabled=True,
                         mmvd_enabled=True, temporal_mvp_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(4):
            dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                                  inter_prob=0.75, skip_prob=0.2, mv_range=32,
                                  ciip_prob=0.4, sbt_prob=0.4, bcw_prob=0.3,
                                  amvr_prob=0.3, mmvd_prob=0.3, bi_prob=0.5)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
            else:
                d = tuple(range(1, min(f, 2) + 1))
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f,
                                        idr=False, slice_type=B_SLICE,
                                        ref_deltas=(d, d))
            stream += nal
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestGpmBitExact:
    """GPM: split modes, uni candidate list, blending masks, motion field."""

    @pytest.mark.parametrize("seed", range(4))
    def test_gpm(self, seed, tmp_path):
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import B_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import make_nal, write_pps, write_sps

        sps = E.make_sps(96, 64, gpm_enabled=True, max_num_gpm_cand=4)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        for f in range(4):
            dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                                  inter_prob=0.8, skip_prob=0.2, mv_range=32,
                                  bi_prob=0.5, geo_prob=0.5, max_gpm_cand=4)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
            else:
                d = tuple(range(1, min(f, 2) + 1))
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f,
                                        idr=False, slice_type=B_SLICE,
                                        ref_deltas=(d, d))
            stream += nal
        ref = ref_decode(stream, tmp_path, expect_frames=4)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestHrdOracle:
    def test_sps_with_hrd_accepted(self, tmp_path):
        """The reference parser must accept our
        general/ols_timing_hrd_parameters layout and the decode must stay
        bit-exact (a layout slip would corrupt every SPS field after it)."""
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)

        sps = E.make_sps(64, 64)
        sps.ptl_dpb_hrd_params_present = True
        sps.timing_hrd_params_present = True
        sps.hrd_params = {
            "num_units_in_tick": 1001, "time_scale": 60000,
            "nal_hrd": True, "vcl_hrd": True, "du_hrd": False,
            "same_pic_timing_in_all_ols": True,
            "bit_rate_scale": 4, "cpb_size_scale": 2, "cpb_cnt": 1,
            "ols": {"sublayers": {0: {
                "fixed_pic_rate_general": True,
                "fixed_pic_rate_within_cvs": True,
                "elemental_duration_in_tc": 1,
                "nal": [{"bit_rate_value": 100, "cpb_size_value": 200,
                         "cbr": False}],
                "vcl": [{"bit_rate_value": 100, "cpb_size_value": 200,
                         "cbr": True}],
            }}},
        }
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        dec = RandomDecisions(seed=3, split_prob=0.5)
        nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0, idr=True)
        stream += nal
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()

    def test_sps_with_vui_accepted(self, tmp_path):
        """The reference parser must accept our vui_parameters layout
        (payload size, alignment, trailing bits) and decode bit-exact."""
        import hashlib

        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)

        sps = E.make_sps(64, 64)
        sps.vui_present = True
        sps.vui = {
            "progressive_source": True,
            "aspect_ratio_constant": True, "aspect_ratio_idc": 1,
            "colour_primaries": 1, "transfer_characteristics": 1,
            "matrix_coeffs": 1, "full_range": False,
            "chroma_sample_loc_type": 0,
        }
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        nal, _ = E.encode_frame(sps, pps, RandomDecisions(seed=4,
                                                          split_prob=0.5),
                                qp=32, poc=0, idr=True)
        stream += nal
        ref = ref_decode(stream, tmp_path)
        out = decode_to_yuv(stream)
        assert hashlib.md5(ref).hexdigest() == hashlib.md5(out).hexdigest()


class TestNativeMotionParity:
    """The native candidate-derivation kernels (walk8.c MotionCtx) must be
    bit-identical to the Python derivation across the full inter toolset."""

    @pytest.mark.parametrize("seed", (0, 3))
    def test_full_toolset_ab(self, seed, monkeypatch):
        from vvdec_tpu.bitstream.nal import NalUnitType
        from vvdec_tpu.decoder import decode_to_yuv
        from vvdec_tpu.hls.params import B_SLICE
        from vvdec_tpu.testenc import encoder as E
        from vvdec_tpu.testenc.bitwriter import BitWriter
        from vvdec_tpu.testenc.encoder import RandomDecisions
        from vvdec_tpu.testenc.hls_writer import (make_nal, write_pps,
                                                  write_sps)

        sps = E.make_sps(96, 64, affine_enabled=True, affine_6param=True,
                         temporal_mvp_enabled=True, sbtmvp_enabled=True,
                         mmvd_enabled=True, smvd_enabled=True,
                         gpm_enabled=True, ciip_enabled=True,
                         bcw_enabled=True, amvr_enabled=True,
                         dmvr_enabled=True, bdof_enabled=True)
        pps = E.make_pps(sps)
        w = BitWriter()
        write_sps(w, sps)
        stream = make_nal(NalUnitType.SPS, w.bytes())
        w = BitWriter()
        write_pps(w, pps, sps)
        stream += make_nal(NalUnitType.PPS, w.bytes())
        dk = dict(split_prob=0.5, inter_prob=0.8, skip_prob=0.15,
                  mv_range=48, bi_prob=0.6, affine_prob=0.25,
                  affine_merge_prob=0.3, geo_prob=0.2, mmvd_prob=0.2,
                  ciip_prob=0.15, smvd_prob=0.2, bcw_prob=0.3,
                  amvr_prob=0.3)
        for f in range(4):
            dec = RandomDecisions(seed=seed * 100 + f, **dk)
            if f == 0:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=0,
                                        idr=True)
            else:
                nal, _ = E.encode_frame(sps, pps, dec, qp=32, poc=f,
                                        idr=False, slice_type=B_SLICE,
                                        ref_deltas=((1,), (1,)))
            stream += nal
        monkeypatch.setenv("VVDEC_TPU_NO_NATIVE_MOTION", "1")
        a = decode_to_yuv(stream)
        monkeypatch.delenv("VVDEC_TPU_NO_NATIVE_MOTION")
        b = decode_to_yuv(stream)
        assert a == b
