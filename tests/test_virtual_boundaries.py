"""Virtual boundaries (360 video): deblocking disabled on the boundary,
SAO skipping samples adjacent to it, ALF clamping at it — bit-exact vs the
reference decoder (LoopFilter xDeriveEdgefilterParam, SampleAdaptiveOffset::
isProcessDisabled, AdaptiveLoopFilter isCrossedByVirtualBoundaries)."""

import os
import subprocess

import pytest

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _vb_stream(seed, n_frames=2, alf=False, sao=True, wh=(96, 64),
               vbx=(48,), vby=(32,), inter=False):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import P_SLICE, RandomDecisions, \
        make_alf_aps, make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(wh[0], wh[1], sao_enabled=sao, alf_enabled=alf,
                     ccalf_enabled=alf,
                     virtual_boundaries_enabled=True,
                     virtual_boundaries_present=True,
                     virtual_boundary_pos_x=list(vbx),
                     virtual_boundary_pos_y=list(vby))
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    sh_kw = {}
    if sao:
        sh_kw.update(sao_enabled_luma=True, sao_enabled_chroma=True)
    apss = {}
    if alf:
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
            apss[i] = aps
            stream += nal
        sh_kw.update(alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                     alf_aps_id_chroma=0)
        if apss[0].cc_alf.new_filter[0]:
            sh_kw.update(ccalf_cb_enabled=True, ccalf_cb_aps_id=0)
    for f in range(n_frames):
        dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                              density=0.15,
                              inter_prob=0.8 if (inter and f) else 0.0,
                              mv_range=32)
        if f == 0 or not inter:
            nal, _ = E.encode_frame(sps, pps, dec, qp=30, poc=f, idr=True,
                                    sh_kw=sh_kw, alf_apss=apss or None)
        else:
            nal, _ = E.encode_frame(sps, pps, dec, qp=30, poc=f, idr=False,
                                    slice_type=P_SLICE, ref_deltas=((1,), ()),
                                    sh_kw=sh_kw, alf_apss=apss or None)
        stream += nal
    return stream


def _check(stream, tmp_path, n_frames):
    from vvdec_tpu.decoder import decode_to_yuv
    bit = tmp_path / "vb.266"
    bit.write_bytes(stream)
    out = tmp_path / "vb_ref.yuv"
    r = subprocess.run([VVDECAPP, "-b", str(bit), "-o", str(out), "-t", "1"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert f"{n_frames} frames decoded" in r.stdout, r.stdout
    assert decode_to_yuv(stream) == out.read_bytes()


@pytest.mark.parametrize("seed", range(3))
def test_vb_deblock_sao_intra(tmp_path, seed):
    _check(_vb_stream(seed), tmp_path, 2)


@pytest.mark.parametrize("seed", range(2))
def test_vb_alf(tmp_path, seed):
    _check(_vb_stream(seed, alf=True), tmp_path, 2)


def test_vb_inter(tmp_path):
    _check(_vb_stream(9, n_frames=3, alf=True, inter=True), tmp_path, 3)


def test_vb_many_boundaries(tmp_path):
    # two vertical + one horizontal boundary, some at CTU edges
    _check(_vb_stream(11, alf=True, vbx=(32, 64), vby=(32,)), tmp_path, 2)


def _ph_vb_stream(seed, n_frames=3, wh=(96, 64), alf=True):
    """SPS enables VBs but signals them per picture (PH), with positions
    varying per frame (sps_virtual_boundaries_present_flag = 0)."""
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.encoder import RandomDecisions, make_alf_aps, \
        make_nal
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps
    from vvdec_tpu.testenc.bitwriter import BitWriter

    sps = E.make_sps(wh[0], wh[1], sao_enabled=True, alf_enabled=alf,
                     ccalf_enabled=alf,
                     virtual_boundaries_enabled=True,
                     virtual_boundaries_present=False)
    pps = E.make_pps(sps)
    w = BitWriter()
    write_sps(w, sps)
    stream = make_nal(NalUnitType.SPS, w.bytes())
    w = BitWriter()
    write_pps(w, pps, sps)
    stream += make_nal(NalUnitType.PPS, w.bytes())
    sh_kw = dict(sao_enabled_luma=True, sao_enabled_chroma=True)
    apss = {}
    if alf:
        for i in range(2):
            aps, nal = make_alf_aps(seed * 10 + i, aps_id=i, cc=True)
            apss[i] = aps
            stream += nal
        sh_kw.update(alf_enabled=[True, True, True],
                     num_alf_aps_ids_luma=2, alf_aps_ids_luma=[0, 1],
                     alf_aps_id_chroma=0)
        if apss[0].cc_alf.new_filter[0]:
            sh_kw.update(ccalf_cb_enabled=True, ccalf_cb_aps_id=0)
    # per-frame PH-signalled positions (incl. one frame with none)
    vb_sets = [((48,), (32,)), ((), ()), ((16, 48), ())]
    for f in range(n_frames):
        vbx, vby = vb_sets[f % len(vb_sets)]
        ph_kw = dict(virtual_boundaries_present=bool(vbx or vby),
                     virtual_boundary_pos_x=list(vbx),
                     virtual_boundary_pos_y=list(vby))
        dec = RandomDecisions(seed=seed * 100 + f, split_prob=0.4,
                              density=0.15)
        nal, _ = E.encode_frame(sps, pps, dec, qp=30, poc=f, idr=True,
                                sh_kw=sh_kw, ph_kw=ph_kw,
                                alf_apss=apss or None)
        stream += nal
    return stream


class TestPhVirtualBoundaries:
    @pytest.mark.parametrize("seed", range(2))
    def test_ph_vb_sao_alf(self, seed, tmp_path):
        _check(_ph_vb_stream(seed), tmp_path, 3)

    def test_ph_vb_sao_only(self, tmp_path):
        _check(_ph_vb_stream(7, alf=False), tmp_path, 3)
