"""Tile binning: map depth-sorted gaussians to chunk-aligned per-tile lists.

TPU-native replacement for the reference's global counting depth sort
(gaussians_selection.js:417-462): instead of one global order consumed by a
GPU instanced draw, we build — with static shapes throughout, so the whole
pass jits — a flat *instance* list (gaussian x overlapped-tile pairs),
lexicographically sorted by (tile, depth-rank) via a two-key ``lax.sort``,
then scatter it into chunk-aligned per-tile ranges. The Pallas blend kernel
walks the flat chunk list; chunk k belongs to tile ``chunk_tile[k]`` and the
first chunk of each tile resets the per-pixel transmittance carry.

Static-budget strategy: ``budget = round_up(budget_factor * N, chunk)``
instances; on overflow the *deepest* instances are dropped (the instance list
is built in depth-sorted order) and ``num_dropped`` reports how many.
Every tile owns at least one (possibly all-padding) chunk so every output
block is written.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.render.projection import Projected


class Binning(NamedTuple):
    order: jax.Array        # [N] i32: depth-sorted gaussian indices
    inst_gauss: jax.Array   # [B_pad] i32: depth-rank per instance, -1 = padding
    chunk_tile: jax.Array   # [K] i32: owning tile of each chunk (monotone)
    chunk_first: jax.Array  # [K] i32: 1 where chunk is its tile's first
    num_instances: jax.Array  # scalar i32 (pre-padding, pre-drop)
    num_dropped: jax.Array    # scalar i32

    @property
    def num_chunks(self) -> int:
        return self.chunk_tile.shape[0]


def instance_budget(n: int, chunk: int, budget_factor: float) -> int:
    b = int(budget_factor * n)
    return -(-b // chunk) * chunk


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "chunk",
                              "budget"))
def bin_gaussians(
    proj: Projected,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    chunk: int,
    budget: int,
) -> Binning:
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    b_pad = budget + num_tiles * chunk

    # --- depth sort (ascending; invalid to the end; stable => index tiebreak)
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    u = proj.means2d[order, 0]
    v = proj.means2d[order, 1]
    r = proj.radius[order]
    valid_s = proj.valid[order]

    # --- tile bbox per sorted gaussian (conservative cover of the 3.33s disc)
    ts = float(tile_size)
    x0 = jnp.clip(jnp.floor((u - r) / ts).astype(jnp.int32), 0, tiles_x)
    x1 = jnp.clip(jnp.ceil((u + r) / ts).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((v - r) / ts).astype(jnp.int32), 0, tiles_y)
    y1 = jnp.clip(jnp.ceil((v + r) / ts).astype(jnp.int32), 0, tiles_y)
    bw = jnp.maximum(x1 - x0, 0)
    bh = jnp.maximum(y1 - y0, 0)
    cnt = jnp.where(valid_s, bw * bh, 0).astype(jnp.int32)

    offsets = jnp.cumsum(cnt) - cnt  # exclusive
    total = offsets[-1] + cnt[-1]
    num_dropped = jnp.maximum(total - budget, 0)

    # --- expand to instances (slot j -> (gaussian rank, tile))
    j = jnp.arange(budget, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(offsets, j, side="right").astype(jnp.int32)
                 - 1, 0, n - 1)
    inside = j < total
    local = j - offsets[g]
    bw_g = jnp.maximum(bw[g], 1)
    tile = (y0[g] + local // bw_g) * tiles_x + (x0[g] + local % bw_g)
    tile = jnp.where(inside, tile, num_tiles)  # sentinel tile for empty slots

    # --- lexicographic (tile, depth-rank) sort: per-tile lists in depth order
    inst_tile, inst_g = jax.lax.sort((tile, g), num_keys=2)

    # --- chunk-aligned per-tile ranges (>= 1 chunk per tile, even if empty)
    n_t = jnp.bincount(inst_tile, length=num_tiles + 1)[:num_tiles]
    tile_start = jnp.cumsum(n_t) - n_t
    pad_cnt = jnp.maximum(-(-n_t // chunk) * chunk, chunk)
    pad_off = jnp.cumsum(pad_cnt) - pad_cnt

    # --- scatter instances into padded slots
    is_real = inst_tile < num_tiles
    t_c = jnp.minimum(inst_tile, num_tiles - 1)
    dst = jnp.where(
        is_real,
        pad_off[t_c] + (jnp.arange(budget, dtype=jnp.int32) - tile_start[t_c]),
        b_pad)
    inst_gauss = jnp.full((b_pad,), -1, dtype=jnp.int32)
    inst_gauss = inst_gauss.at[dst].set(inst_g, mode="drop")

    # --- chunk -> tile maps for the kernel's scalar prefetch
    k = jnp.arange(b_pad // chunk, dtype=jnp.int32) * chunk
    chunk_tile = jnp.clip(
        jnp.searchsorted(pad_off, k, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1)
    chunk_first = (k == pad_off[chunk_tile]).astype(jnp.int32)

    return Binning(order=order, inst_gauss=inst_gauss, chunk_tile=chunk_tile,
                   chunk_first=chunk_first, num_instances=total,
                   num_dropped=num_dropped)
