"""Envelope-widening oracle tests: heavy tool COMBINATIONS that single-
tool test files never produce together (the testenc analog of unusual
real-encoder configurations — VERDICT round-1 weak #9)."""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _check(stream, tmp_path, n_frames):
    from vvdec_tpu.decoder import decode_to_yuv
    bit = tmp_path / "c.266"
    bit.write_bytes(stream)
    out = tmp_path / "c.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t",
                        "1"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert f"{n_frames} frames decoded" in r.stdout, r.stdout
    assert decode_to_yuv(stream) == out.read_bytes()
    assert decode_to_yuv(stream, use_jax=True) == out.read_bytes()


def _combo_stream(seed, *, wh=(128, 96), ctu=32, n_frames=3, sps_kw=None,
                  pps_kw=None, dec_kw=None, lmcs=False, alf=False,
                  vb=None, inter=True, ph_extra=None):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.hls.params import P_SLICE
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import (RandomDecisions, make_alf_aps,
                                           make_lmcs_aps, make_nal)
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    skw = dict(sao_enabled=True, **(sps_kw or {}))
    if lmcs:
        skw["lmcs_enabled"] = True
    if alf:
        skw.update(alf_enabled=True, ccalf_enabled=True)
    if vb:
        skw.update(virtual_boundaries_enabled=True,
                   virtual_boundaries_present=True,
                   virtual_boundary_pos_x=list(vb[0]),
                   virtual_boundary_pos_y=list(vb[1]))
    sps = E.make_sps(wh[0], wh[1], ctu=ctu, **skw)
    pps = E.make_pps(sps, **(pps_kw or {}))
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    ph_kw = dict(ph_extra or {})
    sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True)
    if lmcs:
        _, aps_nal = make_lmcs_aps(seed)
        stream += aps_nal
        ph_kw.update(lmcs_enabled=True, lmcs_aps_id=0,
                     chroma_residual_scale=True)
    if alf:
        apss = {}
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
            apss[i] = aps
            stream += nal
        sh_kw.update(alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                     alf_aps_id_chroma=0)
        if apss[0].cc_alf.new_filter[0]:
            sh_kw.update(ccalf_cb_enabled=True, ccalf_cb_aps_id=0)
        if apss[1].cc_alf.new_filter[1]:
            sh_kw.update(ccalf_cr_enabled=True, ccalf_cr_aps_id=1)
    else:
        apss = None
    dk = dict(split_prob=0.45, density=0.2, sao_prob=0.6,
              **(dec_kw or {}))
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, **dk)
        if f == 0 or not inter:
            nal, _ = E.encode_frame(sps, pps, dec, qp=31, poc=f, idr=True,
                                    sh_kw=sh_kw, ph_kw=ph_kw,
                                    alf_apss=apss)
        else:
            d = tuple(range(1, min(f, 2) + 1))
            nal, _ = E.encode_frame(sps, pps, dec, qp=31, poc=f,
                                    idr=False, slice_type=P_SLICE,
                                    ref_deltas=(d, ()), sh_kw=sh_kw,
                                    ph_kw=ph_kw, alf_apss=apss)
        stream += nal
    return stream


class TestToolCombos:
    @pytest.mark.parametrize("seed", range(2))
    def test_lmcs_alf_sao_inter(self, seed, tmp_path):
        """LMCS (with chroma residual scaling) + SAO + ALF/CC-ALF on an
        inter chain — the full in-loop stack in one stream."""
        s = _combo_stream(seed, lmcs=True, alf=True,
                          dec_kw=dict(inter_prob=0.7, skip_prob=0.2,
                                      mv_range=32, jccr_prob=0.2))
        _check(s, tmp_path, 3)

    @pytest.mark.parametrize("seed", range(2))
    def test_lmcs_alf_virtual_boundaries(self, seed, tmp_path):
        """LMCS + ALF + SAO with 360 virtual boundaries crossing the
        picture."""
        s = _combo_stream(seed, lmcs=True, alf=True, vb=((64,), (32,)),
                          dec_kw=dict(mip_prob=0.2, isp_prob=0.2))
        _check(s, tmp_path, 3)

    @pytest.mark.parametrize("seed", range(2))
    def test_wpp_lmcs_alf_inter(self, seed, tmp_path):
        """WPP entropy sync + LMCS + ALF on inter pictures (substream
        context save/restore interacting with the full filter stack)."""
        s = _combo_stream(seed, lmcs=True, alf=True,
                          sps_kw=dict(entropy_coding_sync=True,
                                      entry_point_offsets_present=True),
                          dec_kw=dict(inter_prob=0.7, mv_range=24))
        _check(s, tmp_path, 3)
