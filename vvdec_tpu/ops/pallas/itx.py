"""Pallas TPU kernel: batched dequantization + separable inverse transform.

The FLOPs core of the decode pipeline (reference: Quant::dequant
Quant.cpp:292 + TrQuant_EMT fastInverse* cores) as one fused kernel per TU
shape class: the per-TU dequant is VPU elementwise work and the two
transform passes are MXU matmuls, all in exact int32 arithmetic (the
bit-exactness contract: 15-bit transform range, rounded shifts, clips).

Batch layout: levels [N, h, w] int32 with per-TU scale/shift vectors
precomputed on host from QP (the qp -> scale table lookup is scalar work;
keeping it on host keeps the kernel purely vectorizable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_LOG2_TR_RANGE = 15
TR_MIN = -(1 << MAX_LOG2_TR_RANGE)
TR_MAX = (1 << MAX_LOG2_TR_RANGE) - 1


def _exact_i32_dot(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Exact int32 = sum_k a[..., k, x] * m[k, y] via MXU float32 matmuls.

    The MXU has no int32 path (Mosaic rejects i32 matmuls), so split the
    16-bit operand into hi/lo bytes: each partial dot's magnitude is
    <= 64 * 2^8 * 2^7 = 2^21 < 2^24, exactly representable in float32;
    the recombination happens in int32.  Transform matrix entries are
    8-bit (|m| <= 128), a is clipped to the 15-bit transform range."""
    hi = (a >> 8).astype(jnp.float32)
    lo = (a & 255).astype(jnp.float32)
    mf = m.astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    dhi = jax.lax.dot_general(hi, mf, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    dlo = jax.lax.dot_general(lo, mf, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    return (dhi.astype(jnp.int32) << 8) + dlo.astype(jnp.int32)


def _itx_kernel(lv_ref, scale_ref, rshift_ref, imax_ref, mv_ref, mh_ref,
                out_ref, *, h: int, w: int, s2: int):
    """One batch tile: dequant (VPU) + 2 transform passes (MXU)."""
    lv = lv_ref[:]                           # [TN, h, w] int32
    scale = scale_ref[:][:, :, None]         # [TN, 1, 1]
    rshift = rshift_ref[:][:, :, None]       # [TN, 1, 1]
    imax = imax_ref[:][:, :, None]           # [TN, 1, 1]

    clipped = jnp.clip(lv, -imax - 1, imax)
    prod = clipped * scale
    rs_pos = jnp.maximum(rshift, 0)
    deq_pos = (prod + (1 << jnp.maximum(rs_pos - 1, 0))) >> rs_pos
    deq_neg = prod << jnp.maximum(-rshift, 0)
    deq = jnp.where(rshift > 0, deq_pos, deq_neg)
    deq = jnp.where(lv != 0, jnp.clip(deq, TR_MIN, TR_MAX), 0)

    # pass 1 (vertical): tmp[n, x, y'] = sum_k deq[n, k, x] * Mv[k, y']
    tmp = _exact_i32_dot(deq, mv_ref[:])      # [TN, w, h]
    tmp = jnp.clip((tmp + (1 << 6)) >> 7, TR_MIN, TR_MAX)
    # pass 2 (horizontal): res[n, y', x'] = sum_k tmp[n, k, y'] * Mh[k, x']
    res = _exact_i32_dot(tmp, mh_ref[:])      # [TN, h, w]
    out_ref[:] = jnp.clip((res + (1 << (s2 - 1))) >> s2, TR_MIN, TR_MAX)


@functools.partial(jax.jit, static_argnames=("h", "w", "bit_depth",
                                             "interpret"))
def itx_batch_pallas(levels: jnp.ndarray, scale: jnp.ndarray,
                     rshift: jnp.ndarray, imax: jnp.ndarray,
                     mv: jnp.ndarray, mh: jnp.ndarray, *, h: int, w: int,
                     bit_depth: int, interpret: bool = False) -> jnp.ndarray:
    """levels [N,h,w] i32, scale/rshift/imax [N] i32, mv [h,h], mh [w,w].

    Returns residual [N,h,w] int32, bit-exact vs the scalar golden
    (recon_np.dequant_block + inverse_transform)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = levels.shape[0]
    s2 = (6 + MAX_LOG2_TR_RANGE - 1) - bit_depth
    kern = functools.partial(_itx_kernel, h=h, w=w, s2=s2)
    # batch-tile so VMEM stays bounded for large frames:
    # tile * (h*w * 3 arrays * 4B) <= ~4MB
    tile = max(1, min(n, (1 << 20) // max(1, h * w)))
    grid = (n + tile - 1) // tile
    if n % tile:
        pad = grid * tile - n
        levels = jnp.pad(levels, ((0, pad), (0, 0), (0, 0)))
        scale = jnp.pad(scale, (0, pad))
        rshift = jnp.pad(rshift, (0, pad), constant_values=1)
        imax = jnp.pad(imax, (0, pad), constant_values=1)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((grid * tile, h, w), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(levels, scale.reshape(-1, 1), rshift.reshape(-1, 1),
      imax.reshape(-1, 1), mv, mh)
    return out[:n]


def dequant_params(qp, w: int, h: int, bit_depth: int, dep_quant: bool):
    """Per-TU dequant parameters (scale, right-shift, input max) from QP
    (Quant.cpp:292 scale/shift derivation).  Works on numpy arrays and on
    traced jnp values (fully jittable)."""
    from vvdec_tpu.ops import rom
    xp = jnp if isinstance(qp, jnp.ndarray) else np
    log2_w, log2_h = w.bit_length() - 1, h.bit_length() - 1
    transform_shift = MAX_LOG2_TR_RANGE - bit_depth - ((log2_w + log2_h) >> 1)
    needs_sqrt2 = ((log2_w + log2_h) & 1) == 1
    i_transform_shift = transform_shift + (-1 if needs_sqrt2 else 0)
    qp = xp.asarray(qp, dtype=xp.int32)
    if dep_quant:
        qp_per = (qp + 1) // 6
        qp_rem = qp + 1 - 6 * qp_per
    else:
        qp_per, qp_rem = qp // 6, qp % 6
    rshift = 6 + (1 if dep_quant else 0) - (i_transform_shift + qp_per)
    scale = xp.asarray(rom.INV_QUANT_SCALES[1 if needs_sqrt2 else 0],
                       dtype=xp.int32)[qp_rem]
    target_bd = xp.minimum(MAX_LOG2_TR_RANGE + 1, 64 + rshift - 7)
    imax = (1 << (target_bd.astype(xp.int64) - 1)).astype(xp.int32) - 1
    return (scale.astype(xp.int32), rshift.astype(xp.int32),
            imax.astype(xp.int32))
