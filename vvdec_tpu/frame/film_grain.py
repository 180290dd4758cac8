"""FGC-SEI-driven film grain synthesis (output side).

Behavioral parity target: the reference's VFGS hardware model
(source/Lib/FilmGrain/FilmGrain.cpp — frequency-filtered 64x64/32x32 grain
patterns selected per intensity interval, per-8-line deterministic seeds,
additive blending applied in VVDecImpl::xAddGrain, vvdecimpl.cpp:894).

This implementation keeps the same architecture — seeded frequency-filtered
pattern database, per-block-line seed stream, intensity-interval scaling,
additive blend with clipping — in vectorized numpy.  The pattern PRNG/LUTs
are not yet the exact VFGS tables, so grain output is deterministic and
spec-shaped but not bit-identical to the reference's synthesis (grain is an
output-side enhancement; it does not affect conformance).
"""

from __future__ import annotations

import numpy as np

BLK = 8  # grain block height in lines (VFGS processes 8-line stripes)


def _prng(x: np.uint32) -> np.uint32:
    """31-bit LFSR used by VFGS for seed streams (FilmGrain.cpp prng)."""
    x = np.uint32(x)
    bit = ((x >> np.uint32(0)) ^ (x >> np.uint32(1)) ^ (x >> np.uint32(3))
           ^ (x >> np.uint32(12))) & np.uint32(1)
    return np.uint32(((x >> np.uint32(1)) | (bit << np.uint32(30)))
                     & np.uint32(0x7FFFFFFF))


def _make_ff_pattern(size: int, fh: int, fv: int, seed: int) -> np.ndarray:
    """Frequency-filtered grain pattern: place seeded Gaussian noise in the
    low-frequency [fv, fh] corner of a size x size DCT grid, zero DC, and
    inverse-transform (make_sei_ff_pattern64/32, FilmGrain.cpp:405-455)."""
    scale = 4 if size == 64 else 2
    fh = scale * (fh + 1)
    fv = scale * (fv + 1)
    rng = np.random.default_rng(seed)
    grid = np.zeros((size, size), dtype=np.float64)
    grid[:min(fv, size), :min(fh, size)] = rng.normal(
        0.0, 64.0, (min(fv, size), min(fh, size)))
    grid[0, 0] = 0.0
    # orthonormal inverse DCT-II in both dims
    try:
        from scipy.fft import idctn  # type: ignore
        blk = idctn(grid, norm="ortho")
    except ImportError:
        blk = _idct_fallback(grid)
    return np.clip(np.round(blk), -127, 127).astype(np.int16)


def _idct_fallback(grid: np.ndarray) -> np.ndarray:
    n = grid.shape[0]
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0] *= 1 / np.sqrt(2)
    basis *= np.sqrt(2 / n)
    return basis.T @ grid @ basis


class FilmGrainSynthesizer:
    """Grain pattern DB + per-frame application."""

    def __init__(self, fgc, bit_depth: int, chroma_format_idc: int):
        self.fgc = fgc
        self.bit_depth = bit_depth
        self.chroma_format_idc = chroma_format_idc
        self.enabled = fgc is not None and not fgc.cancel \
            and any(cm.present for cm in fgc.comp_model)
        self._patterns: dict[tuple, np.ndarray] = {}

    @classmethod
    def from_sei(cls, msg, bit_depth: int, chroma_format_idc: int):
        from vvdec_tpu.hls.sei import parse_fgc
        fgc = parse_fgc(msg)
        return cls(None if fgc.cancel else fgc, bit_depth,
                   chroma_format_idc)

    def _pattern(self, comp: int, fh: int, fv: int) -> np.ndarray:
        size = 64 if comp == 0 else 32
        key = (comp, fh, fv)
        if key not in self._patterns:
            self._patterns[key] = _make_ff_pattern(
                size, fh, fv, seed=0xDEADBEEF ^ (comp << 16)
                ^ (fh << 8) ^ fv)
        return self._patterns[key]

    def apply(self, planes: list, poc: int) -> list:
        """Add grain to output planes (uint16), returning new arrays."""
        if not self.enabled:
            return planes
        fgc = self.fgc
        out = []
        shift = fgc.log2_scale_factor
        pel_max = (1 << self.bit_depth) - 1
        intensity_shift = self.bit_depth - 8
        for comp, plane in enumerate(planes):
            cm = fgc.comp_model[comp] if comp < 3 else None
            if cm is None or not cm.present or not cm.intervals:
                out.append(plane)
                continue
            h, w = plane.shape
            base = plane.astype(np.int32)
            intensity = base >> intensity_shift
            grain = np.zeros((h, w), dtype=np.int32)
            # deterministic per-(poc, stripe) seed stream (VFGS block seeds)
            seed = np.uint32(0xDEADBEEF ^ (poc * 2654435761 & 0x7FFFFFFF))
            size = 64 if comp == 0 else 32
            for y0 in range(0, h, BLK):
                seed = _prng(seed)
                bh = min(BLK, h - y0)
                # tile the pattern across the stripe with a random phase
                for lo, hi, vals in cm.intervals:
                    sigma = vals[0] if vals else 0
                    fh = vals[1] if len(vals) > 1 else 8
                    fv = vals[2] if len(vals) > 2 else fh
                    pat = self._pattern(comp, int(fh) & 15, int(fv) & 15)
                    ox = int(seed) % size
                    oy = (int(seed) >> 8) % max(1, size - bh)
                    row = np.take(pat, (np.arange(w) + ox) % size, axis=1)
                    g = row[oy:oy + bh]
                    mask = ((intensity[y0:y0 + bh] >= lo)
                            & (intensity[y0:y0 + bh] <= hi))
                    grain[y0:y0 + bh] = np.where(
                        mask, (g.astype(np.int32) * sigma) >> shift,
                        grain[y0:y0 + bh])
            if intensity_shift:
                grain <<= intensity_shift
                grain >>= 6  # grain pattern is 8-bit-domain signal
            else:
                grain >>= 6
            out.append(np.clip(base + grain, 0, pel_max).astype(np.uint16))
        return out
