"""Wavefront-batched device intra scan (ops/intra_device.py):
scheduler invariants (units in one step never read cells written in the
same or a later step) and sequential-vs-wavefront bit-equality.

The schedule checker below re-derives each unit's read/write cell sets
from the descriptor fields independently of compute_unit_levels, so a
grouping bug in the level computation cannot hide from it.
"""

import os

import numpy as np
import pytest

from vvdec_tpu.ops.intra_device import (
    D,
    build_intra_descriptors,
    build_wavefront_batches,
    compute_unit_levels,
)
from vvdec_tpu.testenc.encoder import generate_stream

WH = (128, 96)


def _descriptors(stream):
    """Capture every picture's descriptor tensor from a host decode."""
    from vvdec_tpu.decoder import StreamDecoder

    descs = []

    class Cap(StreamDecoder):
        def _reconstruct_inner(self, f):
            desc, reason = build_intra_descriptors(f.cs)
            assert reason is None, reason
            descs.append((desc, f.cs.sps.chroma_format_idc))
            return super()._reconstruct_inner(f)

    dec = Cap()
    dec.push(stream)
    dec.flush()
    return descs


def _read_cells(d, maps_shape):
    """Independent re-derivation of the recon cells one unit reads:
    (comp, y, x) triples at pixel granularity (top/left fill runs; the
    CCLM luma window is handled conservatively by the caller)."""
    cells = set()
    comp = int(d[0])
    if d[10] == 1:
        return cells
    c0, c1 = int(d[15]), int(d[16])
    for rr in {int(d[11]), int(d[12])}:
        for cc in range(c0, c1 + 1):
            cells.add((comp, rr, cc))
    r0, r1 = int(d[21]), int(d[22])
    for cc in {int(d[17]), int(d[18])}:
        for rr in range(max(r0, 0), r1 + 1):
            cells.add((comp, rr, cc))
    return cells


def _check_schedule(desc, cfmt, K):
    lvl = compute_unit_levels(desc, cfmt)
    batches = build_wavefront_batches(desc, lvl, K)
    # every descriptor row appears exactly once
    seen = sorted(
        tuple(r) for b in batches for r in b if r[28] == 1)
    assert len(seen) == desc.shape[0]
    # step at which each cell is written
    write_step: dict = {}
    sub_w = 2 if cfmt in (1, 2) else 1
    sub_h = 2 if cfmt == 1 else 1
    for si, b in enumerate(batches):
        for r in b:
            if r[28] != 1:
                continue
            for cell in _read_cells(r, None):
                ws = write_step.get(cell)
                assert ws is None or ws < si, \
                    f"step {si} reads cell {cell} written at step {ws}"
            if r[7] == 4:  # CCLM: collocated luma must be complete
                x, y, w, h = int(r[1]), int(r[2]), int(r[3]), int(r[4])
                for yy in range(y * sub_h, (y + h) * sub_h):
                    for xx in range(x * sub_w, (x + w) * sub_w):
                        ws = write_step.get((0, yy, xx))
                        assert ws is None or ws < si
        for r in b:
            if r[28] != 1:
                continue
            comp, x, y, w, h = (int(r[0]), int(r[1]), int(r[2]),
                                int(r[3]), int(r[4]))
            for yy in range(y, y + h):
                for xx in range(x, x + w):
                    cell = (comp, yy, xx)
                    assert cell not in write_step, \
                        f"cell {cell} written twice"
                    write_step[cell] = si
    return batches.shape[0], int(lvl.max())


class TestWavefrontSchedule:
    def test_schedule_invariants_basic(self):
        s, _ = generate_stream(width=WH[0], height=WH[1], ctu=32,
                               n_frames=2, seed=11, qp=30,
                               dec_kw=dict(split_prob=0.5, density=0.3))
        for desc, cfmt in _descriptors(s):
            steps, levels = _check_schedule(desc, cfmt, K=8)
            # batching must beat one-unit-per-step
            assert steps < desc.shape[0]
            assert levels <= desc.shape[0]

    def test_schedule_invariants_tool_rich(self):
        s, _ = generate_stream(
            width=WH[0], height=WH[1], ctu=32, n_frames=2, seed=12, qp=28,
            sps_kw=dict(mip_enabled=True, cclm_enabled=True,
                        lfnst_enabled=True),
            dec_kw=dict(split_prob=0.5, density=0.3, mip_prob=0.3))
        for desc, cfmt in _descriptors(s):
            _check_schedule(desc, cfmt, K=8)

    def test_batches_cover_and_pad(self):
        s, _ = generate_stream(width=64, height=64, ctu=32, n_frames=1,
                               seed=13, qp=30)
        (desc, cfmt), = _descriptors(s)
        for K in (1, 4, 64, 1024):
            lvl = compute_unit_levels(desc, cfmt)
            b = build_wavefront_batches(desc, lvl, K)
            assert b.shape[1:] == (K, D)
            valid = b[:, :, 28] == 1
            assert valid.sum() == desc.shape[0]
            # padding rows are all-zero (no-op units)
            assert not b[~valid].any()

    def test_empty_descriptor(self):
        lvl = compute_unit_levels(np.zeros((0, D), np.int32), 1)
        b = build_wavefront_batches(np.zeros((0, D), np.int32), lvl, 8)
        assert b.shape == (0, 8, D)


class TestWavefrontParity:
    """Sequential scan vs wavefront scan, explicit env toggles (the rest
    of the suite runs whichever is the session default)."""

    @pytest.mark.parametrize("kw", [
        dict(seed=21, qp=30, dec_kw=dict(split_prob=0.5, density=0.3)),
        dict(seed=22, qp=28,
             sps_kw=dict(mip_enabled=True, cclm_enabled=True,
                         lfnst_enabled=True),
             dec_kw=dict(split_prob=0.5, density=0.3, mip_prob=0.3)),
    ])
    def test_seq_equals_wavefront(self, kw, monkeypatch):
        from vvdec_tpu.decoder import decode_annexb

        s, _ = generate_stream(width=WH[0], height=WH[1], ctu=32,
                               n_frames=2, **kw)
        monkeypatch.setenv("VVDEC_INTRA_SCAN", "seq")
        seq = decode_annexb(s, use_jax=True)
        monkeypatch.setenv("VVDEC_INTRA_SCAN", "wavefront")
        for k in ("3", "16"):
            monkeypatch.setenv("VVDEC_INTRA_SCAN_K", k)
            wf = decode_annexb(s, use_jax=True)
            for fs, fw in zip(seq, wf):
                for ps, pw in zip(fs, fw):
                    assert np.array_equal(np.asarray(ps), np.asarray(pw))


class TestPrecisionDiscipline:
    def test_one_hot_matmuls_force_exact_precision(self):
        """Every float one-hot gather matmul must pin HIGHEST precision:
        XLA:TPU's default matmul precision truncates f32 inputs to
        bfloat16 (1023 -> 1024), silently breaking bit-exactness on real
        hardware while the CPU-backed suite stays exact."""
        import vvdec_tpu.ops.intra_device as m
        src = open(m.__file__).read()
        n_mm = src.count("jnp.matmul(")
        n_hp = src.count("precision=lax.Precision.HIGHEST")
        assert n_mm == n_hp, (n_mm, n_hp)
