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


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y",
                                             "tile_size"))
def count_instances(proj: Projected, *, tiles_x: int, tiles_y: int,
                    tile_size: int) -> jax.Array:
    """Exact instance count for a projection (cheap: no sort), used to
    right-size the static budget — every B-sized op costs linearly in B."""
    ts = float(tile_size)
    u, v, r = proj.means2d[:, 0], proj.means2d[:, 1], proj.radius
    x0 = jnp.clip(jnp.floor((u - r) / ts).astype(jnp.int32), 0, tiles_x)
    x1 = jnp.clip(jnp.ceil((u + r) / ts).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((v - r) / ts).astype(jnp.int32), 0, tiles_y)
    y1 = jnp.clip(jnp.ceil((v + r) / ts).astype(jnp.int32), 0, tiles_y)
    cnt = jnp.where(proj.valid,
                    jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0), 0)
    return jnp.sum(cnt)


def bucket_budget(count: int, chunk: int, *, slack: float = 1.08,
                  step: float = 1.25) -> int:
    """Round a measured instance count up to a geometric bucket so repeated
    renders reuse compiled programs while keeping <= ~25% budget overshoot."""
    import math

    need = max(int(count * slack), chunk)
    k = math.ceil(math.log(need / chunk, step))
    return -(-int(chunk * step ** max(k, 0)) // chunk) * chunk


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

    # --- expand to instances (slot j -> (gaussian rank, tile)).
    # "segment id from counts" via scatter-add of start markers + cumsum:
    # jnp.searchsorted costs ~128ms for 1M queries on TPU, this costs ~0.2ms.
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop")  # empty gaussians stack marks at the same slot
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total
    # ONE row gather instead of four B-sized gathers: on TPU a B-element
    # gather costs ~7.6ms/1M regardless of row width, so coalescing columns
    # is a ~4x saving on this stage.
    gtab = jnp.stack([offsets, jnp.maximum(bw, 1), x0, y0], axis=1)  # [N, 4]
    grow = gtab[g]                                                   # [B, 4]
    local = j - grow[:, 0]
    bw_g = grow[:, 1]
    # int div/mod by a vector is emulated (slow) on the VPU; bbox extents are
    # small, so exact f32 reciprocal division is safe: (local+0.5)/bw is
    # never integral and f32 error ~2^-24 * quotient << 0.5 => exact floor.
    row = jnp.floor((local.astype(jnp.float32) + 0.5)
                    / bw_g.astype(jnp.float32)).astype(jnp.int32)
    col = local - row * bw_g
    tile = (grow[:, 3] + row) * tiles_x + (grow[:, 2] + col)
    tile = jnp.where(inside, tile, num_tiles)  # sentinel tile for empty slots

    # --- per-tile lists in depth order: instances are emitted in depth-rank
    # order, and lax.sort is stable, so sorting by tile alone (g as payload)
    # keeps equal-tile runs depth-ordered — half the comparator work of a
    # two-key lexicographic sort
    inst_tile, inst_g = jax.lax.sort((tile, g), num_keys=1, is_stable=True)

    # --- per-tile ranges from the SORTED tile array: searchsorted with only
    # num_tiles+1 queries (scatter-based bincount costs ~9ms at 1M instances)
    tile_start = jnp.searchsorted(
        inst_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    n_t = jnp.diff(tile_start)
    tile_start = tile_start[:num_tiles]

    # --- chunk-aligned per-tile ranges (>= 1 chunk per tile, even if empty)
    pad_cnt = jnp.maximum(-(-n_t // chunk) * chunk, chunk)
    pad_off = jnp.cumsum(pad_cnt) - pad_cnt

    # --- chunk -> tile maps for the kernel's scalar prefetch (marker-cumsum;
    # pad_cnt >= chunk makes tile starts distinct chunks)
    num_chunks = b_pad // chunk
    cmarks = jnp.zeros((num_chunks,), jnp.int32).at[pad_off // chunk].add(
        1, mode="drop")
    chunk_tile = jnp.clip(jnp.cumsum(cmarks) - 1, 0, num_tiles - 1)
    chunk_first = (cmarks > 0).astype(jnp.int32)

    # --- scatter instances into padded chunk-aligned slots (dst is monotone;
    # a scatter beats the gather formulation here, measured on v5e)
    is_real = inst_tile < num_tiles
    t_c = jnp.minimum(inst_tile, num_tiles - 1)
    ttab = jnp.stack([pad_off, tile_start], axis=1)  # [T, 2], one row gather
    trow = ttab[t_c]                                 # [B, 2]
    dst = jnp.where(is_real, trow[:, 0] + (j - trow[:, 1]), b_pad)
    inst_gauss = jnp.full((b_pad,), -1, dtype=jnp.int32)
    inst_gauss = inst_gauss.at[dst].set(inst_g, mode="drop")

    return Binning(order=order, inst_gauss=inst_gauss, chunk_tile=chunk_tile,
                   chunk_first=chunk_first, num_instances=total,
                   num_dropped=num_dropped)
