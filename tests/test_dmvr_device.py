"""Device DMVR + BDOF (ops/dmvr_device.py): the refinement search,
sub-pel fit, padded final MC and per-subblock BDOF blend run inside the
device decode path.  Every test checks bit-exactness against the host
golden decode and that the pictures actually stayed device-resident."""

import numpy as np

from tests.test_dmvr_bdof import _bpyramid_stream


class TestDmvrKernels:
    """Randomized kernel-level parity vs the numpy goldens (the
    reference's SIMD-vs-scalar unit-test pattern,
    tests/vvdec_unit_test)."""

    def test_search_decide_parity(self):
        import jax.numpy as jnp
        from vvdec_tpu.frame.dmvr_np import dmvr_search
        from vvdec_tpu.ops.dmvr_device import dmvr_decide_core
        from vvdec_tpu.ops.mc_device import dmvr_sad25_core

        rng = np.random.default_rng(7)
        for trial in range(6):
            dx, dy = int(rng.choice([8, 16])), int(rng.choice([8, 16]))
            N = 32
            bl0 = rng.integers(0, 1 << 10,
                               size=(N, dy + 4, dx + 4)).astype(np.int64)
            if trial % 3 == 1:  # quantized values force SAD ties
                bl0 = (bl0 // 200) * 200
            bl1 = np.roll(bl0, tuple(rng.integers(-2, 3, size=2)),
                          axis=(1, 2))
            bl1 = bl1 + rng.integers(-6, 7, size=bl1.shape)
            sads = dmvr_sad25_core(dx, dy)(
                jnp.asarray(bl0, jnp.int32), jnp.asarray(bl1, jnp.int32))
            dmv, cost = dmvr_decide_core(dx, dy)(sads)
            dmv, cost = np.asarray(dmv), np.asarray(cost)
            for k in range(N):
                hd, hc = dmvr_search(bl0[k], bl1[k], 0, 0, dx, dy)
                assert tuple(dmv[k]) == hd and int(cost[k]) == hc, \
                    (trial, k, hd, tuple(dmv[k]), hc, int(cost[k]))

    def test_final_mc_parity(self):
        """dmvr_final_core (window-clamped refined-MV MC + BDOF ext)
        vs dmvr_np.mc_from_view through the golden's prefetch-window
        view, over random merge MVs and refinement deltas."""
        import jax.numpy as jnp
        from vvdec_tpu.frame import dmvr_np as D
        from vvdec_tpu.frame import inter_np as I
        from vvdec_tpu.ops.dmvr_device import dmvr_final_core

        rng = np.random.default_rng(3)
        W, H, ctu, bd, m = 96, 64, 32, 10, 56
        plane = rng.integers(0, 1 << bd, size=(H, W)).astype(np.int32)
        pl_pad = np.pad(plane, m, mode="edge")
        refs = jnp.asarray(pl_pad[None])
        dx = dy = 16

        class _CS:
            pass

        cs = _CS()
        cs.w, cs.h = W, H
        cs.subpics = []
        cs.sps = _CS()
        cs.sps.ref_wraparound_enabled = False
        cs.sps.ctu_size = ctu
        cs.subpic_at = lambda x, y: None

        def golden(bx, by, mv0, dmv, alt):
            rmv = (D._clip18(mv0[0] + dmv[0]), D._clip18(mv0[1] + dmv[1]))
            mvc = I.clip_mv(rmv, bx, by, cs, size=(32, 32))
            dix = (rmv[0] >> 4) - (mv0[0] >> 4)
            diy = (rmv[1] >> 4) - (mv0[1] >> 4)
            fx, fy = mvc[0] & 15, mvc[1] & 15
            if dix or diy:
                wmv = I.clip_mv((mv0[0] - 48, mv0[1] - 48), bx, by, cs,
                                size=(32, 32))
                wx, wy = bx + (wmv[0] >> 4), by + (wmv[1] >> 4)
                view = D.RefView.window(plane, wx, wy, dx + 7, dy + 7)
                ix = (wmv[0] >> 4) + dix + 3
                iy = (wmv[1] >> 4) + diy + 3
            else:
                view = D.RefView(plane)
                ix, iy = mvc[0] >> 4, mvc[1] >> 4
            return D.mc_from_view(view, bx, by, dx, dy, ix, iy, fx, fy,
                                  0, bd, True, bio_ext=True, alt_hpel=alt)

        fn = dmvr_final_core(dx, dy, 0, 4, 4, bd, pl_pad.shape[0],
                             pl_pad.shape[1], 1, m, W, H, True)
        N = 96
        bx = (rng.integers(0, (W - dx) // 4, size=N) * 4).astype(np.int32)
        by = (rng.integers(0, (H - dy) // 4, size=N) * 4).astype(np.int32)
        mvx = rng.integers(-300, 300, size=N).astype(np.int32)
        mvy = rng.integers(-300, 300, size=N).astype(np.int32)
        dvx = rng.integers(-40, 41, size=N).astype(np.int32)
        dvy = rng.integers(-40, 41, size=N).astype(np.int32)
        alt = rng.integers(0, 2, size=N).astype(bool)
        blk, ext = fn(refs, jnp.zeros(N, jnp.int32), jnp.asarray(bx),
                      jnp.asarray(by), jnp.asarray(mvx), jnp.asarray(mvy),
                      jnp.asarray((-ctu - 8 - bx + 1) << 4),
                      jnp.asarray((W + 8 - bx - 1) << 4),
                      jnp.asarray((-ctu - 8 - by + 1) << 4),
                      jnp.asarray((H + 8 - by - 1) << 4),
                      jnp.asarray(dvx), jnp.asarray(dvy),
                      jnp.asarray(alt))
        blk, ext = np.asarray(blk), np.asarray(ext)
        for k in range(N):
            gb, ge = golden(int(bx[k]), int(by[k]),
                            (int(mvx[k]), int(mvy[k])),
                            (int(dvx[k]), int(dvy[k])), bool(alt[k]))
            assert np.array_equal(gb, blk[k]), k
            assert np.array_equal(ge, ext[k]), k


def _assert_both(stream):
    from vvdec_tpu.decoder import decode_annexb
    host = decode_annexb(stream)
    dev = decode_annexb(stream, use_jax=True)
    assert len(host) == len(dev)
    for fh, fd in zip(host, dev):
        for ph, pd in zip(fh, fd):
            assert np.array_equal(np.asarray(ph), np.asarray(pd))


def _census(stream):
    from vvdec_tpu.api import Decoder, DecoderParams
    d = Decoder(DecoderParams(use_device_pipeline=True))
    frames = d.decode(stream)
    frames += d.flush()
    return d.get_fallback_census(), frames


class TestDmvrDevice:
    def test_bdof_standalone(self):
        stream = _bpyramid_stream(
            1, dict(bdof_enabled=True),
            dict(split_prob=0.35, inter_prob=0.8, skip_prob=0.2,
                 mv_range=40, bi_prob=0.8))
        _assert_both(stream)

    def test_dmvr(self):
        stream = _bpyramid_stream(
            2, dict(dmvr_enabled=True),
            dict(split_prob=0.35, inter_prob=0.8, skip_prob=0.3,
                 mv_range=40, bi_prob=0.8))
        _assert_both(stream)

    def test_dmvr_bdof_combined(self):
        stream = _bpyramid_stream(
            3, dict(dmvr_enabled=True, bdof_enabled=True,
                    temporal_mvp_enabled=True, mmvd_enabled=True,
                    amvr_enabled=True, bcw_enabled=True),
            dict(split_prob=0.4, inter_prob=0.8, skip_prob=0.25,
                 mv_range=40, bi_prob=0.7, mmvd_prob=0.2, amvr_prob=0.3,
                 bcw_prob=0.3))
        _assert_both(stream)

    def test_dmvr_bdof_seeds(self):
        for seed in (4, 5):
            stream = _bpyramid_stream(
                seed, dict(dmvr_enabled=True, bdof_enabled=True),
                dict(split_prob=0.35, inter_prob=0.85, skip_prob=0.2,
                     mv_range=48, bi_prob=0.9))
            _assert_both(stream)

    def test_stays_on_device(self):
        """A DMVR+BDOF stream must run device-resident: no
        device_recon:* fallback entries in the census."""
        stream = _bpyramid_stream(
            6, dict(dmvr_enabled=True, bdof_enabled=True),
            dict(split_prob=0.35, inter_prob=0.9, skip_prob=0.2,
                 mv_range=40, bi_prob=0.9))
        census, frames = _census(stream)
        assert len(frames) == 5
        assert not any(k.startswith("device_recon") for k in census), \
            census
