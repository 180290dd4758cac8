"""Device-mesh sharding for the decode pipeline.

The TPU-native counterparts of the reference's parallelism strategies
(SURVEY.md §2.6): CTU-row sharding with halo exchange for in-loop filter
stencils (P3 — DecLibRecon's CTU wavefront), and frame-axis data
parallelism for the batched per-TU stages (P2 — the 2 rotating recon
instances / parse-ahead).  Collectives ride the mesh via shard_map +
jax.lax.ppermute; XLA lowers them to ICI transfers on real slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_decode_mesh(n_devices: int | None = None, rows: int | None = None
                     ) -> Mesh:
    """Mesh over ("frame", "row"): frame-parallel x CTU-row-parallel."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if rows is None:
        rows = 2 if n % 2 == 0 and n > 1 else 1
    frames = n // rows
    return Mesh(np.array(devices[:frames * rows]).reshape(frames, rows),
                ("frame", "row"))


def halo_map_rows(fn, x: jnp.ndarray, halo: int, mesh: Mesh,
                  axis: str = "row"):
    """Apply `fn(padded_shard) -> filtered_shard` over row-shards of a
    plane [H, W], exchanging `halo` boundary rows with the neighbouring
    shards over the mesh axis (ppermute = ICI neighbour exchange).

    `fn` receives [shard_h + 2*halo, W] (edge shards see replicated-edge
    padding, matching whole-frame filter behavior at picture borders) and
    must return the filtered core [shard_h, W].
    """
    from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]

    def shard_fn(xs: jnp.ndarray) -> jnp.ndarray:
        idx = jax.lax.axis_index(axis)
        # neighbour halo rows: bottom rows of the shard above, top rows of
        # the shard below
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        from_above = jax.lax.ppermute(xs[-halo:, :], axis, fwd)
        from_below = jax.lax.ppermute(xs[:halo, :], axis, bwd)
        # picture-edge shards: replicate the edge row instead
        top_pad = jnp.where(idx == 0,
                            jnp.repeat(xs[:1, :], halo, axis=0), from_above)
        bot_pad = jnp.where(idx == n_shards - 1,
                            jnp.repeat(xs[-1:, :], halo, axis=0), from_below)
        padded = jnp.concatenate([top_pad, xs, bot_pad], axis=0)
        return fn(padded)

    sharding = P(axis, None)
    mapped = shard_map(shard_fn, mesh=mesh, in_specs=(sharding,),
                       out_specs=sharding)
    return mapped(x)


def frame_parallel(fn, batch: jnp.ndarray, mesh: Mesh, axis: str = "frame"):
    """Shard a per-frame batched stage over the frame axis (DP analog of
    the reference's parse-ahead + rotating recon instances)."""
    from jax.experimental.shard_map import shard_map

    spec = P(axis, *([None] * (batch.ndim - 1)))
    mapped = shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return mapped(batch)


def vertical_121(padded: jnp.ndarray) -> jnp.ndarray:
    """[1 2 1] vertical smoothing on a halo-padded shard (halo = 1); the
    stencil shape of the deblock/SAO boundary reads."""
    core = padded[1:-1, :]
    return (padded[:-2, :] + 2 * core + padded[2:, :] + 2) >> 2
