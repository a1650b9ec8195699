"""Tile binning: map depth-sorted gaussians to chunk-aligned per-tile lists.

TPU-native replacement for the reference's global counting depth sort
(gaussians_selection.js:417-462): instead of one global order consumed by a
GPU instanced draw, we build — with static shapes throughout, so the whole
pass jits — a flat *instance* list (gaussian x overlapped-tile pairs),
sorted by tile via a stable ``lax.sort`` (instances are emitted in depth
order, so equal-tile runs stay depth-ordered), then scatter it into
chunk-aligned per-tile ranges. The Pallas blend kernel walks the flat chunk
list; chunk k belongs to tile ``chunk_tile[k]``, the first chunk of each
tile resets the per-pixel transmittance carry, and ``chunk_live[k]`` lets the
kernel skip all-padding chunks.

Instance enumeration is *tight*: candidate tiles come from the bbox of the
per-axis cutoff-ellipse extents, then each (gaussian, tile) pair is kept only
if the exact minimum of the Mahalanobis quadratic over the tile rectangle is
<= the gaussian's opacity-aware cutoff ``qmax`` — pairs that cannot produce
any alpha >= alpha_min are filtered before the sort, so they cost no blend
compute (they sort to the end as sentinels and their chunks are dead).

Static-budget strategy: ``budget`` bounds the bbox enumeration (on overflow
the *deepest* instances are dropped — the instance list is built in
depth-sorted order — and ``num_dropped`` reports how many);
``kernel_budget <= budget`` sizes the chunk-aligned array the blend kernel
walks, and can be bucketed to the (smaller) tight count. Every tile owns at
least one (possibly all-padding) chunk so every output block is written.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.render.projection import Projected


class WindowBinning(NamedTuple):
    """Depth-ordered per-tile instance *windows* over a dense sorted stream.

    Round-2 redesign of :class:`Binning`: instead of scattering instances
    into a chunk-aligned slot array (two B-sized scatters + a B_pad-row
    gather), the instance stream stays DENSE in (tile, depth-rank) sorted
    order and the blend kernel walks fixed-size windows of it, DMA-ing each
    window's rows from HBM at a dynamic offset. Construction is one packed
    single-key ``lax.sort`` plus O(T)-sized table work — no per-instance
    scatters at all.
    """

    order: jax.Array      # [N] i32: depth-sorted gaussian indices
    ranks: jax.Array      # [B] i32: depth-rank per sorted instance
    win_tile: jax.Array   # [K] i32: owning tile of each window (monotone)
    win_first: jax.Array  # [K] i32: 1 where window is its tile's first
    win_start: jax.Array  # [K] i32: row offset into the sorted stream
    win_len: jax.Array    # [K] i32: live rows in the window (0..chunk)
    enum_kernel_row: jax.Array  # [B] i32: kernel grad-output row per
    #                     ENUMERATION index (gaussian-major), OOB if dropped
    enum_start: jax.Array  # [N] i32: first enumeration index per gaussian
    enum_cnt: jax.Array    # [N] i32: bbox candidate count per gaussian
    num_instances: jax.Array  # scalar i32 (tight count, pre-drop)
    num_dropped: jax.Array    # scalar i32

    @property
    def num_windows(self) -> int:
        return self.win_tile.shape[0]


def num_windows_static(kernel_budget: int, chunk: int, num_tiles: int) -> int:
    """Static window count UPPER BOUND: every tile owns >= 1 window and the
    per-tile proportional cap bounds total live rows by kernel_budget.
    Callers that can measure should pass ``count_windows`` (bucketed) as
    ``num_windows`` instead — the bound above overshoots by ~25% of grid
    steps on typical scenes (padding windows cost ~0.45us each on v5e)."""
    return kernel_budget // chunk + num_tiles


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "chunk",
                              "budget", "kernel_budget", "num_windows"))
def bin_windows(
    proj: Projected,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    chunk: int,
    budget: int,
    kernel_budget: Optional[int] = None,
    num_windows: Optional[int] = None,
) -> WindowBinning:
    """Window binning (see WindowBinning). Enumeration runs in ORIGINAL
    gaussian order; depth ordering rides the sort key, so no per-gaussian
    arrays are gathered into depth order first.

    Reference semantics being replaced: the global counting depth sort of
    gaussians_selection.js:417-462 (here: per-tile depth order via one packed
    key sort) and the instanced draw's implicit gaussian->tile fan-out
    (js:1609).
    """
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    if kernel_budget is None:
        kernel_budget = budget
    ts = float(tile_size)

    # --- depth rank per gaussian (original order): one argsort + one
    # inverse-permutation scatter; no field gathers.
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)

    # --- bbox enumeration in original order
    u, v = proj.means2d[:, 0], proj.means2d[:, 1]
    x0, y0, bw, cnt = _tile_bbox(u, v, proj.extent[:, 0], proj.extent[:, 1],
                                 proj.valid, ts, tiles_x, tiles_y)
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]

    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total

    # ONE padded-width row gather for every per-gaussian field the
    # enumeration needs (width 16 gathers are ~3x faster than width 10 on
    # v5e — row alignment, measured in scripts/profile_candidates.py).
    if budget < (1 << 24):
        etab = jnp.stack([
            offsets.astype(jnp.float32),
            jnp.maximum(bw, 1).astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            rank.astype(jnp.float32),
            u, v, proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.qmax,
        ] + [jnp.zeros((n,), jnp.float32)] * 5, axis=1)   # [N, 16]
        erow = etab.at[g].get(indices_are_sorted=True)    # [B, 16]
        e_off = erow[:, 0].astype(jnp.int32)
        e_rank = erow[:, 4].astype(jnp.int32)
    else:
        # f32 cannot represent offsets/ranks >= 2^24 exactly (ADVICE r1):
        # pay two extra i32 gathers on huge scenes.
        etab = jnp.stack([
            jnp.zeros((n,), jnp.float32),
            jnp.maximum(bw, 1).astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            jnp.zeros((n,), jnp.float32),
            u, v, proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.qmax,
        ] + [jnp.zeros((n,), jnp.float32)] * 5, axis=1)
        erow = etab.at[g].get(indices_are_sorted=True)
        e_off = offsets.at[g].get(indices_are_sorted=True)
        e_rank = rank.at[g].get(indices_are_sorted=True)

    local = j - e_off
    bw_g = erow[:, 1]
    # bbox extents are small: exact f32 reciprocal division (see r1 notes)
    row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
    col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
    row = row.astype(jnp.int32)
    tcol = erow[:, 2].astype(jnp.int32) + col
    trow = erow[:, 3].astype(jnp.int32) + row
    tile = trow * tiles_x + tcol

    # --- tight filter: exact ellipse/tile-rect intersection
    min_q = _rect_min_q(erow[:, 5], erow[:, 6], erow[:, 7], erow[:, 8],
                        erow[:, 9], tcol.astype(jnp.float32) * ts,
                        trow.astype(jnp.float32) * ts, ts)
    keep = inside & (min_q <= erow[:, 10])
    tile = jnp.where(keep, tile, num_tiles)  # sentinel tile sorts last
    tight = jnp.sum(keep.astype(jnp.int32))

    # --- ONE packed-key sort: key = tile << RB | rank. Unique keys (one
    # instance per (gaussian, tile)), so the unstable single-array sort is
    # deterministic and equal-tile runs come out depth-ordered. The
    # enumeration index rides along as payload: the blend VJP segment-sums
    # instance gradients in enumeration order (gaussian-major), which needs
    # the stream-position -> enumeration-index map.
    rank_bits = max((n - 1).bit_length(), 1)
    if (num_tiles + 1) << rank_bits < 2 ** 31:
        key = (tile << rank_bits) | e_rank
        key = jnp.where(keep, key, (num_tiles << rank_bits) | e_rank)
        keys, je_sorted = jax.lax.sort((key, j), num_keys=1)
        ranks = keys & ((1 << rank_bits) - 1)
        bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits
        tile_start = jnp.searchsorted(keys, bounds, side="left"
                                      ).astype(jnp.int32)
    else:
        # huge-scene fallback: two-key lexicographic sort
        inst_tile, ranks, je_sorted = jax.lax.sort(
            (tile, e_rank, j), num_keys=2)
        tile_start = jnp.searchsorted(
            inst_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)

    n_t = jnp.diff(tile_start)
    tile_start = tile_start[:num_tiles]
    # Kernel-budget cap: shed each tile's DEEPEST instances proportionally
    # (suffixes of per-tile depth-ordered runs), not whole trailing tiles
    # (ADVICE r1 #5). Only binds when tight > kernel_budget.
    over = tight > kernel_budget
    scale = jnp.where(over, kernel_budget / jnp.maximum(tight, 1), 1.0)
    n_keep = jnp.where(
        over, jnp.floor(n_t.astype(jnp.float32) * scale).astype(jnp.int32),
        n_t)

    # --- windows: tile t owns max(ceil(n_keep/chunk), 1) consecutive windows
    if num_windows is None:
        k_static = num_windows_static(kernel_budget, chunk, num_tiles)
    else:
        k_static = max(num_windows, num_tiles + 1)
    nw = jnp.maximum(-(-n_keep // chunk), 1)
    # Window-count cap (binds only when the measured/bucketed num_windows
    # undershot): shrink the multi-window tiles proportionally, shedding
    # their deepest instances, so sum(nw) <= k_static always holds.
    nw_total0 = jnp.sum(nw)
    over_w = nw_total0 > k_static
    scale_w = jnp.where(
        over_w,
        (k_static - num_tiles) / jnp.maximum(nw_total0 - num_tiles, 1), 1.0)
    nw = jnp.where(
        over_w,
        1 + jnp.floor((nw - 1).astype(jnp.float32) * scale_w
                      ).astype(jnp.int32),
        nw)
    n_keep = jnp.minimum(n_keep, nw * chunk)
    num_dropped = (jnp.maximum(total - budget, 0) + jnp.sum(n_t - n_keep))

    wstart_t = jnp.cumsum(nw) - nw                     # [T] first window idx
    nw_total = wstart_t[-1] + nw[-1]
    kk = jnp.arange(k_static, dtype=jnp.int32)
    # spread tile ids down window slots: tile ids are monotone, one cummax
    seed = jnp.zeros((k_static,), jnp.int32).at[wstart_t].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    win_tile = jax.lax.cummax(seed)
    local_w = kk - wstart_t[win_tile]
    win_first = (local_w == 0).astype(jnp.int32)
    win_start = tile_start[win_tile] + local_w * chunk
    win_len = jnp.clip(n_keep[win_tile] - local_w * chunk, 0, chunk)
    # padding windows past nw_total: revisit the LAST tile, zero-length
    pad = kk >= nw_total
    win_tile = jnp.where(pad, num_tiles - 1, win_tile)
    win_first = jnp.where(pad, 0, win_first)
    win_start_pad = jnp.where(pad, 0, win_start)
    win_len = jnp.where(pad, 0, win_len)

    # --- enumeration-index -> kernel grad-output row. The backward kernel
    # writes window k's grad rows at [k*(chunk+WIN_PAD) + (s - base_k)] for
    # stream position s, base_k = 8-aligned fetch start. Spread the owning
    # window index / start / end down the stream with three cummaxes (all
    # monotone along the stream), then scatter through the sort payload.
    from gsplat_tpu.render.blend_pallas import WIN_PAD
    s_idx = j  # stream positions [budget]
    drop_pad = jnp.where(pad, budget, win_start_pad)  # OOB -> dropped seeds
    wids = jnp.arange(k_static, dtype=jnp.int32)
    w_of_s = jax.lax.cummax(
        jnp.zeros((budget,), jnp.int32).at[drop_pad].max(wids, mode="drop"))
    ws_of_s = jax.lax.cummax(
        jnp.zeros((budget,), jnp.int32).at[drop_pad].max(
            win_start, mode="drop"))
    we_of_s = jax.lax.cummax(
        jnp.zeros((budget,), jnp.int32).at[drop_pad].max(
            win_start + win_len, mode="drop"))
    base = (ws_of_s // 8) * 8
    kernel_row = w_of_s * (chunk + WIN_PAD) + (s_idx - base)
    krows = k_static * (chunk + WIN_PAD)
    kernel_row = jnp.where(s_idx < we_of_s, kernel_row, krows)
    enum_kernel_row = jnp.full((budget,), krows, jnp.int32).at[
        je_sorted].set(kernel_row, mode="drop", unique_indices=True)

    return WindowBinning(order=order, ranks=ranks, win_tile=win_tile,
                         win_first=win_first, win_start=win_start_pad,
                         win_len=win_len, enum_kernel_row=enum_kernel_row,
                         enum_start=offsets, enum_cnt=cnt,
                         num_instances=tight, num_dropped=num_dropped)


class Binning(NamedTuple):
    order: jax.Array        # [N] i32: depth-sorted gaussian indices
    inst_gauss: jax.Array   # [B_pad] i32: depth-rank per instance, -1 = padding
    chunk_tile: jax.Array   # [K] i32: owning tile of each chunk (monotone)
    chunk_first: jax.Array  # [K] i32: 1 where chunk is its tile's first
    chunk_live: jax.Array   # [K] i32: 1 where chunk has >= 1 real instance
    inst_dst: jax.Array     # [B] i32: kernel slot per ENUMERATION index
    #                         (gaussian-major, depth order), b_pad = dropped
    enum_start: jax.Array   # [N] i32: first enumeration index per sorted
    #                         gaussian (exclusive prefix of bbox counts)
    enum_cnt: jax.Array     # [N] i32: bbox instance count per sorted gaussian
    num_instances: jax.Array  # scalar i32 (tight count, pre-drop)
    num_dropped: jax.Array    # scalar i32

    @property
    def num_chunks(self) -> int:
        return self.chunk_tile.shape[0]


def instance_budget(n: int, chunk: int, budget_factor: float) -> int:
    b = int(budget_factor * n)
    return -(-b // chunk) * chunk


def _tile_bbox(u, v, ex, ey, valid, ts, tiles_x, tiles_y):
    x0 = jnp.clip(jnp.floor((u - ex) / ts).astype(jnp.int32), 0, tiles_x)
    x1 = jnp.clip(jnp.ceil((u + ex) / ts).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(jnp.floor((v - ey) / ts).astype(jnp.int32), 0, tiles_y)
    y1 = jnp.clip(jnp.ceil((v + ey) / ts).astype(jnp.int32), 0, tiles_y)
    bw = jnp.maximum(x1 - x0, 0)
    bh = jnp.maximum(y1 - y0, 0)
    cnt = jnp.where(valid, bw * bh, 0).astype(jnp.int32)
    return x0, y0, bw, cnt


def _rect_min_q(mx, my, ca, cb, cc, rx0, ry0, ts: float):
    """Exact min of the conic quadratic q(p) = a dx^2 + 2b dxdy + c dy^2 over
    the tile rectangle [rx0, rx0+ts] x [ry0, ry0+ts] (convex: either the mean
    is inside, or the minimum lies on one of the four edges, where the 1-D
    restriction minimizes in closed form)."""
    x0 = rx0 - mx
    x1 = x0 + ts
    y0 = ry0 - my
    y1 = y0 + ts
    inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def q_edge_x(ex):
        ys = jnp.clip(-cb * ex / cc_s, y0, y1)
        return (ca * ex + 2.0 * cb * ys) * ex + cc * ys * ys

    def q_edge_y(ey):
        xs = jnp.clip(-cb * ey / ca_s, x0, x1)
        return (cc * ey + 2.0 * cb * xs) * ey + ca * xs * xs

    mq = jnp.minimum(jnp.minimum(q_edge_x(x0), q_edge_x(x1)),
                     jnp.minimum(q_edge_y(y0), q_edge_y(y1)))
    return jnp.where(inside, 0.0, mq)


@functools.partial(jax.jit, static_argnames=("tiles_x", "tiles_y",
                                             "tile_size"))
def count_instances(proj: Projected, *, tiles_x: int, tiles_y: int,
                    tile_size: int) -> jax.Array:
    """Bbox instance count (no sort): an upper bound on the tight count,
    used to size the static enumeration budget."""
    u, v = proj.means2d[:, 0], proj.means2d[:, 1]
    _, _, _, cnt = _tile_bbox(u, v, proj.extent[:, 0], proj.extent[:, 1],
                              proj.valid, float(tile_size), tiles_x, tiles_y)
    return jnp.sum(cnt)


def _expand_instances(u, v, extent, conic, qmax, valid, *, tiles_x, tiles_y,
                      tile_size, budget, n):
    """Enumerate (depth-rank, tile) instance pairs from depth-SORTED per-
    gaussian arrays; tight-filtered pairs get the sentinel tile ``num_tiles``.
    Returns (tile [B], g [B], total bbox count, tight count)."""
    ts = float(tile_size)
    num_tiles = tiles_x * tiles_y
    x0, y0, bw, cnt = _tile_bbox(u, v, extent[:, 0], extent[:, 1], valid,
                                 ts, tiles_x, tiles_y)

    offsets = jnp.cumsum(cnt) - cnt  # exclusive
    total = offsets[-1] + cnt[-1]

    # --- expand to instances (slot j -> (gaussian rank, tile)).
    # "segment id from counts" via scatter-add of start markers + cumsum:
    # jnp.searchsorted costs ~128ms for 1M queries on TPU, this costs ~0.2ms.
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop")  # empty gaussians stack marks at the same slot
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total
    # ONE row gather instead of ten B-sized gathers: on TPU a B-element
    # gather costs ~7.6ms/1M regardless of row width, so coalescing columns
    # is a big saving on this stage.
    gtab = jnp.stack([
        offsets.astype(jnp.float32), jnp.maximum(bw, 1).astype(jnp.float32),
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        u, v, conic[:, 0], conic[:, 1], conic[:, 2], qmax], axis=1)  # [N,10]
    grow = gtab[g]                                                   # [B,10]
    local = j - grow[:, 0].astype(jnp.int32)
    bw_g = grow[:, 1]
    # int div/mod by a vector is emulated (slow) on the VPU; bbox extents are
    # small, so exact f32 reciprocal division is safe: (local+0.5)/bw is
    # never integral and f32 error ~2^-24 * quotient << 0.5 => exact floor.
    row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
    col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
    row = row.astype(jnp.int32)
    tcol = grow[:, 2].astype(jnp.int32) + col
    trow = grow[:, 3].astype(jnp.int32) + row
    tile = trow * tiles_x + tcol

    # --- tight filter: exact ellipse/tile-rect intersection
    min_q = _rect_min_q(grow[:, 4], grow[:, 5], grow[:, 6], grow[:, 7],
                        grow[:, 8], tcol.astype(jnp.float32) * ts,
                        trow.astype(jnp.float32) * ts, ts)
    keep = inside & (min_q <= grow[:, 9])
    tile = jnp.where(keep, tile, num_tiles)  # sentinel tile
    tight = jnp.sum(keep.astype(jnp.int32))
    return tile, g, total, tight, offsets, cnt


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "budget"))
def count_instances_tight(proj: Projected, *, tiles_x: int, tiles_y: int,
                          tile_size: int, budget: int) -> jax.Array:
    """Exact tight instance count (runs the enumeration + filter, no sort);
    used to right-size ``kernel_budget``. ``budget`` must be >= the bbox
    count (from ``count_instances``)."""
    n = proj.depth.shape[0]
    order = jnp.argsort(
        jnp.where(proj.valid, proj.depth, jnp.inf), stable=True
    ).astype(jnp.int32)
    tight = _expand_instances(
        proj.means2d[order, 0], proj.means2d[order, 1], proj.extent[order],
        proj.conic[order], proj.qmax[order], proj.valid[order],
        tiles_x=tiles_x, tiles_y=tiles_y, tile_size=tile_size, budget=budget,
        n=n)[3]
    return tight


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "chunk",
                              "budget", "kernel_budget"))
def count_windows(proj: Projected, *, tiles_x: int, tiles_y: int,
                  tile_size: int, chunk: int, budget: int,
                  kernel_budget: int) -> jax.Array:
    """Exact window count bin_windows will produce (before window-shedding):
    sum over tiles of max(ceil(n_keep/chunk), 1). Used to right-size the
    static grid so padding windows don't burn grid steps (~0.45us each)."""
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    ts = float(tile_size)
    u, v = proj.means2d[:, 0], proj.means2d[:, 1]
    x0, y0, bw, cnt = _tile_bbox(u, v, proj.extent[:, 0], proj.extent[:, 1],
                                 proj.valid, ts, tiles_x, tiles_y)
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total
    etab = jnp.stack([
        offsets.astype(jnp.float32), jnp.maximum(bw, 1).astype(jnp.float32),
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        u, v, proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.qmax,
    ] + [jnp.zeros((n,), jnp.float32)] * 6, axis=1)
    erow = etab.at[g].get(indices_are_sorted=True)
    local = j - erow[:, 0].astype(jnp.int32)
    bw_g = erow[:, 1]
    row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
    col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
    tcol = erow[:, 2].astype(jnp.int32) + col
    trow = erow[:, 3].astype(jnp.int32) + row.astype(jnp.int32)
    tile = trow * tiles_x + tcol
    min_q = _rect_min_q(erow[:, 4], erow[:, 5], erow[:, 6], erow[:, 7],
                        erow[:, 8], tcol.astype(jnp.float32) * ts,
                        trow.astype(jnp.float32) * ts, ts)
    keep = inside & (min_q <= erow[:, 9])
    tight = jnp.sum(keep.astype(jnp.int32))
    n_t = jnp.zeros((num_tiles + 1,), jnp.int32).at[
        jnp.where(keep, tile, num_tiles)].add(1, mode="drop")[:num_tiles]
    over = tight > kernel_budget
    scale = jnp.where(over, kernel_budget / jnp.maximum(tight, 1), 1.0)
    n_keep = jnp.where(
        over, jnp.floor(n_t.astype(jnp.float32) * scale).astype(jnp.int32),
        n_t)
    return jnp.sum(jnp.maximum(-(-n_keep // chunk), 1))


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
                              "budget", "kernel_budget"))
def bin_gaussians(
    proj: Projected,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    chunk: int,
    budget: int,
    kernel_budget: Optional[int] = None,
) -> Binning:
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    if kernel_budget is None:
        kernel_budget = budget
    b_pad = kernel_budget + num_tiles * chunk

    # --- depth sort (ascending; invalid to the end; stable => index tiebreak)
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)

    tile, g, total, tight, enum_start, enum_cnt = _expand_instances(
        proj.means2d[order, 0], proj.means2d[order, 1], proj.extent[order],
        proj.conic[order], proj.qmax[order], proj.valid[order],
        tiles_x=tiles_x, tiles_y=tiles_y, tile_size=tile_size, budget=budget,
        n=n)
    # Instances dropped: bbox overflow past the enumeration budget, plus
    # tight instances that don't fit the kernel budget (deepest-first both).
    num_dropped = (jnp.maximum(total - budget, 0)
                   + jnp.maximum(tight - kernel_budget, 0))

    # --- per-tile lists in depth order: instances are emitted in depth-rank
    # order, and lax.sort is stable, so sorting by tile alone (g as payload)
    # keeps equal-tile runs depth-ordered — half the comparator work of a
    # two-key lexicographic sort. Filtered/padding instances carry the
    # sentinel tile and sort to the end.
    je = jnp.arange(budget, dtype=jnp.int32)  # enumeration index payload
    inst_tile, inst_g, inst_je = jax.lax.sort(
        (tile, g, je), num_keys=1, is_stable=True)

    # --- per-tile ranges from the SORTED tile array: searchsorted with only
    # num_tiles+1 queries (scatter-based bincount costs ~9ms at 1M instances)
    tile_start = jnp.searchsorted(
        inst_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    n_t = jnp.diff(tile_start)
    tile_start = tile_start[:num_tiles]
    # Cap per-tile counts so Sum(ceil(n_t/chunk)*chunk) <= b_pad always holds
    # (kernel-budget overflow sheds whole trailing tiles' excess; only binds
    # when tight > kernel_budget, i.e. the budget heuristic undershot).
    csum = jnp.cumsum(n_t)
    n_t = jnp.clip(kernel_budget - (csum - n_t), 0, n_t)

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
    # chunk k is live iff its slot range intersects its tile's real instances
    k_idx = jnp.arange(num_chunks, dtype=jnp.int32)
    local_off = k_idx * chunk - pad_off[chunk_tile]
    chunk_live = ((local_off >= 0) & (local_off < n_t[chunk_tile])
                  ).astype(jnp.int32)

    # --- scatter instances into padded chunk-aligned slots. The destination
    # is dst = pad_off[t] + (j - tile_start[t]) = j + delta[t] with
    # delta[t] = pad_off[t] - tile_start[t] constant per tile run of the
    # SORTED stream — so instead of a B-row table gather (~2ms at 250k on
    # v5e) we scatter num_tiles values at the run starts and spread them
    # down the runs with one cummax (delta rides a +K*t ramp to stay
    # monotone; K bounds |delta| <= b_pad and the ramp fits i32).
    j = jnp.arange(budget, dtype=jnp.int32)
    is_real = inst_tile < num_tiles
    span = budget + b_pad + 1
    ramp_k = 1 << max(span - 1, 1).bit_length()

    if ramp_k * (num_tiles + 2) < 2 ** 31:

        def spread(vals):
            """Scatter per-tile vals at run starts, spread down the sorted
            stream with one cummax (a +ramp_k*t staircase keeps the running
            max pinned to the current run's seed)."""
            enc = vals + ramp_k * jnp.arange(1, num_tiles + 1,
                                             dtype=jnp.int32)
            seed = jnp.full((budget,), jnp.int32(-2 ** 31), jnp.int32)
            seed = seed.at[tile_start].max(enc, mode="drop")
            return jax.lax.cummax(seed) - ramp_k * (inst_tile + 1)

        delta = spread(pad_off - tile_start)
        cap = spread(pad_off + n_t)   # dst < cap <=> rank_in_tile < n_t[t]
    else:
        # huge-image fallback: the staircase would overflow i32 — pay the
        # B-row table gather instead
        t_c = jnp.minimum(inst_tile, num_tiles - 1)
        ttab = jnp.stack([pad_off - tile_start, pad_off + n_t], axis=1)
        trow = ttab[t_c]
        delta, cap = trow[:, 0], trow[:, 1]
    dst = j + delta
    dst = jnp.where(is_real & (dst < cap), dst, b_pad)
    inst_gauss = jnp.full((b_pad,), -1, dtype=jnp.int32)
    inst_gauss = inst_gauss.at[dst].set(inst_g, mode="drop")
    # enumeration-order slot map: the instance->gaussian gradient reduction
    # (pack's custom VJP) segment-sums consecutive enumeration runs, which
    # costs ~2ms where the naive scatter-add transpose costs ~5ms at 300k.
    inst_dst = jnp.full((budget,), b_pad, dtype=jnp.int32)
    inst_dst = inst_dst.at[inst_je].set(dst, mode="drop")

    return Binning(order=order, inst_gauss=inst_gauss, chunk_tile=chunk_tile,
                   chunk_first=chunk_first, chunk_live=chunk_live,
                   inst_dst=inst_dst, enum_start=enum_start,
                   enum_cnt=enum_cnt,
                   num_instances=tight, num_dropped=num_dropped)
