"""Oracle bit-exactness tests for explicit weighted prediction."""

import os

import pytest

from tests.test_affine import _check

VVDECAPP = os.environ.get("VVDECAPP", "/tmp/vvdec_bin/vvdecapp")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VVDECAPP), reason="reference vvdecapp not built")


def _wp_stream(seed, n_frames, slice_type, sps_kw, pps_kw, dec_kw):
    from vvdec_tpu.bitstream.nal import NalUnitType
    from vvdec_tpu.testenc import encoder as E
    from vvdec_tpu.testenc.bitwriter import BitWriter
    from vvdec_tpu.testenc.encoder import (
        RandomDecisions, make_nal, make_weight_table,
    )
    from vvdec_tpu.testenc.hls_writer import write_pps, write_sps

    sps = E.make_sps(96, 64, **sps_kw)
    pps = E.make_pps(sps, **pps_kw)
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
            d = tuple(range(1, min(f, 2) + 1))
            deltas = (d, d if slice_type == 0 else ())
            n0 = max(1, len(deltas[0]))
            n1 = len(deltas[1]) if slice_type == 0 else 0
            wt = make_weight_table(seed * 100 + f, n0, n1)
            nal, _ = E.encode_frame(
                sps, pps, dec, qp=32, poc=f, idr=False,
                slice_type=slice_type, ref_deltas=deltas,
                sh_kw=dict(weight_table=wt))
        stream += nal
    return stream


class TestWeightedPred:
    @pytest.mark.parametrize("seed", range(3))
    def test_wp_p_slices(self, seed, tmp_path):
        stream = _wp_stream(
            seed, 4, 1, dict(weighted_pred=True),
            dict(weighted_pred=True),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40))
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(3))
    def test_wp_b_slices(self, seed, tmp_path):
        stream = _wp_stream(
            seed, 4, 0,
            dict(temporal_mvp_enabled=True, weighted_bipred=True),
            dict(weighted_bipred=True),
            dict(split_prob=0.4, inter_prob=0.7, skip_prob=0.2,
                 mv_range=40, bi_prob=0.6))
        _check(stream, tmp_path, 4)

    @pytest.mark.parametrize("seed", range(2))
    def test_wp_all_tools(self, seed, tmp_path):
        stream = _wp_stream(
            seed, 5, 0,
            dict(temporal_mvp_enabled=True, bdof_enabled=True,
                 dmvr_enabled=True, bcw_enabled=True, mmvd_enabled=True,
                 affine_enabled=True, affine_6param=True, prof_enabled=True,
                 sbtmvp_enabled=True, ciip_enabled=True, sbt_enabled=True,
                 weighted_bipred=True),
            dict(weighted_bipred=True),
            dict(split_prob=0.4, inter_prob=0.75, skip_prob=0.2,
                 mv_range=40, bi_prob=0.5, mmvd_prob=0.2, bcw_prob=0.3,
                 affine_prob=0.3, affine_merge_prob=0.3, ciip_prob=0.2,
                 sbt_prob=0.2))
        _check(stream, tmp_path, 5)
