"""Tile binning: depth-ordered per-tile instance windows, static shapes.

TPU-native replacement for the reference's global counting depth sort
(gaussians_selection.js:417-462): instead of one global order consumed by a
GPU instanced draw, we build — with static shapes throughout, so the whole
pass jits — a flat *instance* stream (gaussian x overlapped-tile pairs) in
(tile, depth) order via one packed-key ``lax.sort``, and the Pallas blend
kernel walks fixed-size WINDOWS of that dense stream (see WindowBinning).

Instance enumeration is *tight*: candidate tiles come from the bbox of the
per-axis cutoff-ellipse extents, then each (gaussian, tile) pair is kept only
if the exact minimum of the Mahalanobis quadratic over the tile rectangle is
<= the gaussian's opacity-aware cutoff ``qmax`` — pairs that cannot produce
any alpha >= alpha_min are filtered before the sort, so they cost no blend
compute (they sort to the end as sentinels past every window).

Static-budget strategy: ``budget`` bounds the bbox enumeration (on overflow
the *deepest* instances are dropped and ``num_dropped`` reports how many);
``kernel_budget <= budget`` caps the live instances windows may cover
(per-tile proportional shedding of the deepest); ``num_windows`` sizes the
Pallas grid (measure with ``count_windows`` + bucket). Every tile owns at
least one (possibly zero-length) window so every output block is written.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.render.projection import Projected


class WindowBinning(NamedTuple):
    """Depth-ordered per-tile instance *windows* over a dense sorted stream.

    Round-3 redesign: the round-2 pipeline paid a full-N stable depth
    argsort + rank scatter (just to build a packed (tile, rank) sort key)
    plus an [N, 16] permutation gather every frame. Now ONE stable
    packed-key ``lax.sort`` over the instance stream does everything: the
    key is ``tile << db | qdepth`` where ``qdepth`` is the truncated
    positive-f32 bit pattern of the view depth (monotone in depth; see
    :func:`depth_qkeys`), and the payloads carry the gaussian index (to
    gather parameter rows directly in original order) and the enumeration
    index (for the backward pass's grad-row map). Windows are 8-row aligned
    (f32 sublane tiling) so the blend kernel fetches and computes exactly
    ``chunk`` rows — no WIN_PAD slop rows.

    Reference semantics being replaced: the 16-bit-quantized counting depth
    sort of gaussians_selection.js:417-462 — quantized depth keys with a
    deterministic index tie-break are the same semantics, made canonical
    (ref/rasterizer.py orders by exactly (qdepth, index)).
    """

    inst_gauss: jax.Array  # [B] i32: gaussian index per sorted instance
    win_tile: jax.Array   # [K] i32: owning tile of each window (monotone)
    win_first: jax.Array  # [K] i32: 1 where window is its tile's first
    win_start: jax.Array  # [K] i32: 8-ALIGNED row offset into the stream
    win_off: jax.Array    # [K] i32: dead leading rows (0..7, first window)
    win_len: jax.Array    # [K] i32: live rows in the window (0..chunk)
    win_rcg: jax.Array    # [K] i32: GLOBAL tile (row << 16 | col) of each
    #                     window — differs from the local decode of
    #                     win_tile under interleaved tile ownership
    enum_kernel_row: jax.Array  # [B] i32: kernel grad-output row per
    #                     ENUMERATION index (gaussian-major), OOB if dropped
    enum_start: jax.Array  # [N] i32: first enumeration index per gaussian
    enum_cnt: jax.Array    # [N] i32: bbox candidate count per gaussian
    num_instances: jax.Array  # scalar i32 (tight count, pre-drop)
    num_dropped: jax.Array    # scalar i32

    @property
    def num_windows(self) -> int:
        return self.win_tile.shape[0]


def depth_shift(num_tiles: int) -> int:
    """Right-shift applied to the positive-f32 depth bit pattern to form the
    quantized depth key: the packed (tile << db | qd) sort key spends the
    high bits on the tile id, and qd must stay < 2^22 so it is exact in the
    f32 enumeration table. Keeps >= 13 mantissa bits (relative depth
    resolution ~1.2e-4, far finer than the reference's 4096-bucket counting
    sort, gaussians_selection.js:437). Floored at 10 so every grid up to
    512 tiles — full images, sharded tile-bands, and the oracle — shares ONE
    canonical quantization and therefore one canonical compositing order."""
    return max(num_tiles.bit_length() + 1, 10)


def depth_qkeys(depth: jax.Array, valid: jax.Array,
                num_tiles: int) -> jax.Array:
    """[N] i32 canonical quantized depth keys (non-negative).

    Positive-f32 bit patterns are monotone in the float value, so the
    truncated bits order by depth; ties are broken by gaussian index via
    the stable instance sort (enumeration is gaussian-major). The oracle
    (ref/rasterizer.py) sorts by exactly (qd, index)."""
    bits = jax.lax.bitcast_convert_type(
        jnp.where(valid, depth, jnp.float32(1.0)), jnp.int32)
    return jax.lax.shift_right_logical(bits, depth_shift(num_tiles))


def num_windows_static(kernel_budget: int, chunk: int, num_tiles: int,
                       wpg: int = 1) -> int:
    """Static window count UPPER BOUND: every tile owns >= wpg windows, the
    per-tile proportional cap bounds total live rows by kernel_budget,
    8-alignment of each tile's first window can add one more window per
    tile, and rounding each tile's window count up to a multiple of ``wpg``
    (windows per kernel grid step) can add wpg-1 more. Callers that can
    measure should pass ``count_windows`` (bucketed) as ``num_windows``
    instead — the bound above overshoots by ~25% of grid steps on typical
    scenes (padding windows cost ~0.3us each on v5e)."""
    raw = kernel_budget // chunk + (1 + wpg) * num_tiles
    return -(-raw // wpg) * wpg


def _enum_key_kernel(total_ref, erow_ref, key_ref, *, ts: float,
                     tiles_x: int, num_tiles: int, db: int, blk: int,
                     row_stride: int, col_stride: int):
    """Pallas enumeration-key kernel: one pass over the gathered per-slot
    rows computes slot -> (tile, packed sort key) entirely in VMEM.

    Rationale (r3.2 trace): doing this math in XLA materializes every
    column of the [B, 16] gather as a separate T(1024)-layout array —
    ~1.5 ms/frame of pure relayout at B=224k (slice_reduce + convert
    fusions). Here ONE in-register transpose exposes the 11 fields as
    contiguous [1, blk] rows and the whole computation (~45 elementwise
    ops) runs at VPU speed (~0.1 ms/frame), writing only the i32 key.

    The static row/col strides + prefetched phases map LOCAL tile
    rows/cols to the GLOBAL tiles this device owns (2D-interleaved tile
    ownership; see _tile_bbox) — the exact ellipse/rect test runs against
    the global rectangle while the packed key carries the local tile id."""
    bj0 = pl.program_id(0) * blk
    et = erow_ref[...].T                                  # [16, blk]
    j = bj0 + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    e_off = et[0:1, :].astype(jnp.int32)
    bw_g = et[1:2, :]
    ex0, ey0 = et[2:3, :], et[3:4, :]
    e_qd = et[4:5, :].astype(jnp.int32)
    # exactly the XLA-path arithmetic (f32 IEEE: bit-identical keep set)
    local = (j - e_off).astype(jnp.float32)
    row = jnp.floor((local + 0.5) / bw_g)
    col = (local - row * bw_g).astype(jnp.int32)
    tcol = ex0.astype(jnp.int32) + col
    trow = ey0.astype(jnp.int32) + row.astype(jnp.int32)
    tile = trow * tiles_x + tcol
    trow_g = total_ref[1] + trow * row_stride              # global tile row
    tcol_g = total_ref[2] + tcol * col_stride              # global tile col
    min_q = _rect_min_q(et[5:6, :], et[6:7, :], et[7:8, :], et[8:9, :],
                        et[9:10, :], tcol_g.astype(jnp.float32) * ts,
                        trow_g.astype(jnp.float32) * ts, ts)
    keep = (j < total_ref[0]) & (min_q <= et[10:11, :])
    tile = jnp.where(keep, tile, num_tiles)
    key = jax.lax.bitwise_or(jax.lax.shift_left(tile, db), e_qd)
    key_ref[...] = key.reshape(blk)


def _enum_keys(erow: jax.Array, total: jax.Array, *, ts: float,
               tiles_x: int, num_tiles: int, db: int,
               interpret: Optional[bool] = None,
               row_stride: int = 1, row_phase=0,
               col_stride: int = 1, col_phase=0) -> jax.Array:
    """[B] i32 packed (tile << db | qdepth) sort keys from the gathered
    enumeration rows (sentinel ``num_tiles << db | qd`` for filtered/empty
    slots). Pallas on TPU, interpret elsewhere; callers that run the blend
    kernels in interpret mode on TPU (parity/debug) thread the same flag
    here so the whole debug path interprets together (ADVICE r3 #1).

    Binning is non-differentiable by design (the render VJP returns zeros
    for every binning operand, render/api.py), so tangents stop HERE —
    pallas_call has no JVP rule for scalar-prefetch kernels and the i32
    keys carry no gradient anyway."""
    erow = jax.lax.stop_gradient(erow)
    total = jax.lax.stop_gradient(total)
    budget = erow.shape[0]
    # Block size must be a multiple of 1024 (XLA's 1-D i32 tile, which
    # Mosaic requires the output block to align with); the final partial
    # block is masked by Pallas (padded reads produce sentinel keys on
    # j >= total, and out-of-range rows are never written back).
    blk = min(4096, -(-budget // 1024) * 1024)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(-(-budget // blk),),
        in_specs=[pl.BlockSpec((blk, 16), lambda i, t: (i, 0))],
        out_specs=pl.BlockSpec((blk,), lambda i, t: (i,)),
    )
    scalars = jnp.stack([total.astype(jnp.int32),
                         jnp.asarray(row_phase, jnp.int32),
                         jnp.asarray(col_phase, jnp.int32)])
    return pl.pallas_call(
        functools.partial(_enum_key_kernel, ts=ts, tiles_x=tiles_x,
                          num_tiles=num_tiles, db=db, blk=blk,
                          row_stride=row_stride, col_stride=col_stride),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((budget,), jnp.int32),
        interpret=interpret,
    )(scalars, erow)


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "chunk",
                              "budget", "kernel_budget", "num_windows",
                              "wpg", "interpret", "row_stride",
                              "col_stride"))
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
    wpg: int = 1,
    interpret: Optional[bool] = None,
    row_stride: int = 1,
    row_phase=0,
    col_stride: int = 1,
    col_phase=0,
) -> WindowBinning:
    """Window binning (see WindowBinning). Enumeration runs in ORIGINAL
    gaussian order; depth ordering rides the quantized-depth bits of the
    packed sort key, so there is NO per-gaussian depth argsort anywhere
    (the r2 full-N stable argsort cost ~18s of XLA compile and ~1ms/frame).

    With row/col strides the caller owns only the 2D-interleaved global
    tiles (row ≡ row_phase mod row_stride, col ≡ col_phase mod
    col_stride); ``tiles_x``/``tiles_y`` count LOCAL tiles and projected
    coordinates stay global — the sharded renderer's load-balanced tile
    decomposition (see _tile_bbox). Phases may be traced (axis_index
    inside shard_map).

    Reference semantics being replaced: the global counting depth sort of
    gaussians_selection.js:417-462 (here: per-tile depth order via one
    packed-key sort over instances) and the instanced draw's implicit
    gaussian->tile fan-out (js:1609).
    """
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    if kernel_budget is None:
        kernel_budget = budget
    ts = float(tile_size)
    db = 32 - depth_shift(num_tiles)   # depth bits in the packed key
    qd = depth_qkeys(proj.depth, proj.valid, num_tiles)   # [N] i32 < 2^22

    # --- bbox enumeration in original order
    u, v = proj.u, proj.v
    x0, y0, bw, cnt = _tile_bbox(u, v, proj.ex, proj.ey,
                                 proj.valid, ts, tiles_x, tiles_y,
                                 row_stride, row_phase,
                                 col_stride, col_phase)
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]

    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)  # offsets monotone: XLA's
    # sorted-scatter path skips the serial SMEM loop (~0.9ms at N=100k)
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
            qd.astype(jnp.float32),          # < 2^22: exact in f32
            u, v, proj.ca, proj.cb, proj.cc,
            proj.qmax,
        ] + [jnp.zeros((n,), jnp.float32)] * 5, axis=1)   # [N, 16]
        erow = etab.at[g].get(mode="clip")                # [B, 16]
        # slot -> packed sort key, one Pallas pass (see _enum_key_kernel)
        key = _enum_keys(erow, total, ts=ts, tiles_x=tiles_x,
                         num_tiles=num_tiles, db=db, interpret=interpret,
                         row_stride=row_stride, row_phase=row_phase,
                         col_stride=col_stride, col_phase=col_phase)
    else:
        # f32 cannot represent offsets >= 2^24 exactly (ADVICE r1): pay an
        # extra i32 gather on huge scenes (qd < 2^22 stays exact) and keep
        # the key math in XLA.
        etab = jnp.stack([
            jnp.zeros((n,), jnp.float32),
            jnp.maximum(bw, 1).astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            qd.astype(jnp.float32),
            u, v, proj.ca, proj.cb, proj.cc,
            proj.qmax,
        ] + [jnp.zeros((n,), jnp.float32)] * 5, axis=1)
        erow = etab.at[g].get(mode="clip")
        e_off = offsets.at[g].get(mode="clip")
        e_qd = erow[:, 4].astype(jnp.int32)

        local = j - e_off
        bw_g = erow[:, 1]
        # bbox extents are small: exact f32 reciprocal division (r1 notes)
        row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
        col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
        row = row.astype(jnp.int32)
        tcol = erow[:, 2].astype(jnp.int32) + col
        trow = erow[:, 3].astype(jnp.int32) + row
        tile = trow * tiles_x + tcol
        trow_g = jnp.asarray(row_phase, jnp.int32) + trow * row_stride
        tcol_g = jnp.asarray(col_phase, jnp.int32) + tcol * col_stride

        # --- tight filter: exact ellipse/tile-rect intersection (against
        # the GLOBAL tile rectangle under interleaved tile ownership)
        min_q = _rect_min_q(erow[:, 5], erow[:, 6], erow[:, 7], erow[:, 8],
                            erow[:, 9], tcol_g.astype(jnp.float32) * ts,
                            trow_g.astype(jnp.float32) * ts, ts)
        keep = inside & (min_q <= erow[:, 10])
        tile = jnp.where(keep, tile, num_tiles)  # sentinel sorts last
        key = (tile << db) | e_qd

    # --- ONE STABLE packed-key sort: key = tile << db | qdepth. Stability
    # breaks quantized-depth ties by enumeration index (gaussian-major), so
    # equal-tile runs come out in canonical (qdepth, gaussian index) order —
    # exactly the oracle's order (ref/rasterizer.py). Payloads: the gaussian
    # index (parameter rows are gathered straight from the original-order
    # table — no [N,16] permutation gather) and the enumeration index (the
    # blend VJP segment-sums instance gradients in enumeration order).
    keys, inst_gauss, je_sorted = jax.lax.sort(
        (key, g, j), num_keys=1, is_stable=True)
    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) << db
    tile_start = jnp.searchsorted(keys, bounds, side="left"
                                  ).astype(jnp.int32)

    n_t = jnp.diff(tile_start)
    # live (non-sentinel) instance count, read off the sorted keys — the
    # sentinel boundary is bounds[num_tiles] (replaces a separate
    # sum-over-keep reduction)
    tight = tile_start[num_tiles]
    tile_start = tile_start[:num_tiles]
    # Kernel-budget cap: shed each tile's DEEPEST instances proportionally
    # (suffixes of per-tile depth-ordered runs), not whole trailing tiles
    # (ADVICE r1 #5). Only binds when tight > kernel_budget.
    over = tight > kernel_budget
    scale = jnp.where(over, kernel_budget / jnp.maximum(tight, 1), 1.0)
    n_keep = jnp.where(
        over, jnp.floor(n_t.astype(jnp.float32) * scale).astype(jnp.int32),
        n_t)

    # --- windows: 8-ALIGNED starts so the kernel fetches and computes
    # exactly ``chunk`` rows (f32 sublane tiling). Each tile's first window
    # starts at base_t = align8(tile_start) and masks off the (0..7) foreign
    # lead rows; subsequent windows stay aligned. Tile t owns
    # max(ceil((lead_t + n_keep_t)/chunk), 1) consecutive windows.
    if num_windows is None:
        k_static = num_windows_static(kernel_budget, chunk, num_tiles, wpg)
    else:
        k_static = max(num_windows, (num_tiles + 1) * wpg)
        k_static = -(-k_static // wpg) * wpg
    base_t = (tile_start // 8) * 8
    lead_t = tile_start - base_t                       # 0..7
    # Per-tile window counts, rounded up to a multiple of wpg (windows per
    # kernel grid step) so every grid GROUP's windows share one tile — the
    # group carries compositing state between its windows in-register and
    # issues one wpg*chunk-row DMA. The rounding only adds DEAD padding
    # windows (win_len 0): zero extra blend compute.
    ng = jnp.maximum(-(-(-(-(lead_t + n_keep) // chunk)) // wpg), 1)  # groups
    # Group-count cap (binds only when the measured/bucketed num_windows
    # undershot): shrink the multi-group tiles proportionally, shedding
    # their deepest instances, so sum(ng) <= k_static // wpg always holds.
    k_groups = k_static // wpg
    ng_total0 = jnp.sum(ng)
    over_w = ng_total0 > k_groups
    scale_w = jnp.where(
        over_w,
        (k_groups - num_tiles) / jnp.maximum(ng_total0 - num_tiles, 1), 1.0)
    ng = jnp.where(
        over_w,
        1 + jnp.floor((ng - 1).astype(jnp.float32) * scale_w
                      ).astype(jnp.int32),
        ng)
    nw = ng * wpg
    n_keep = jnp.clip(nw * chunk - lead_t, 0, n_keep)
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
    win_start = base_t[win_tile] + local_w * chunk     # 8-aligned
    win_off = jnp.where(local_w == 0, lead_t[win_tile], 0)
    end_t = tile_start + n_keep                        # [T] live end
    win_len = jnp.maximum(
        jnp.clip(end_t[win_tile] - win_start, 0, chunk) - win_off, 0)
    # padding windows past nw_total: revisit the LAST tile, zero-length
    pad = kk >= nw_total
    win_tile = jnp.where(pad, num_tiles - 1, win_tile)
    win_first = jnp.where(pad, 0, win_first)
    win_start_pad = jnp.where(pad, 0, win_start)
    win_off = jnp.where(pad, 0, win_off)
    win_len = jnp.where(pad, 0, win_len)

    # --- enumeration-index -> kernel grad-output row. The backward kernel
    # writes window k's grad rows at [k*chunk + (s - win_start_k)] for
    # stream position s; within tile t the windows are chunk-strided from
    # base_t, so the map is per-tile AFFINE: kernel_row(s) = wstart_t*chunk
    # + (s - base_t), live while s < tile_start_t + n_keep_t. The owning
    # tile of every sorted position is just the high bits of the sorted
    # packed key, so ONE [B, 16] row gather from a tiny per-tile table
    # replaces the r3.0 three scatter+cummax spreads (row gathers are
    # ~0.34ms at B=246k on v5e where three [B] scatter+cummax chains cost
    # ~0.8ms; single-COLUMN [B] gathers would be 1.7ms — keep it a row
    # gather; scripts/profile_bin_parts.py).
    s_idx = j  # stream positions [budget]
    krows = k_static * chunk
    tile_of_s = jnp.minimum(
        jax.lax.shift_right_logical(keys, db), num_tiles - 1)
    if budget < (1 << 24) and krows < (1 << 24):
        # |wstart_t*chunk - base_t| < max(krows, budget) and end_live <=
        # budget: exact in f32, so one wide row gather serves both columns.
        ttab = jnp.stack(
            [(wstart_t * chunk - base_t).astype(jnp.float32),
             (tile_start + n_keep).astype(jnp.float32)]
            + [jnp.zeros((num_tiles,), jnp.float32)] * 14, axis=1)  # [T, 16]
        trow_s = ttab.at[tile_of_s].get(mode="clip")
        kernel_row = s_idx + trow_s[:, 0].astype(jnp.int32)
        kernel_row = jnp.where(s_idx < trow_s[:, 1].astype(jnp.int32),
                               kernel_row, krows)
    else:
        # huge scenes: two exact i32 gathers (slower, correct — ADVICE r1)
        kernel_row = s_idx + (wstart_t * chunk - base_t).at[tile_of_s].get(
            mode="clip")
        kernel_row = jnp.where(
            s_idx < (tile_start + n_keep).at[tile_of_s].get(mode="clip"),
            kernel_row, krows)
    # inverse-permute kernel_row back to enumeration order by SORTING on the
    # (unique) enum indices with kernel_row as payload — ~3x faster than the
    # equivalent [B] scatter on v5e (scripts/profile_bin_parts.py:
    # sort 0.2-0.4ms vs scatter 1.2ms at B=246k)
    _, enum_kernel_row = jax.lax.sort((je_sorted, kernel_row), num_keys=1)

    # global tile (row << 16 | col) per window: the blend kernels run the
    # quadratic form in GLOBAL pixel coordinates (instance means are never
    # shifted), so interleaved tile ownership only changes this [K]-sized
    # map (rows/cols < 2^15 covers any realistic tile grid)
    wrow_g = (jnp.asarray(row_phase, jnp.int32)
              + (win_tile // tiles_x) * row_stride)
    wcol_g = (jnp.asarray(col_phase, jnp.int32)
              + (win_tile % tiles_x) * col_stride)
    win_rcg = (wrow_g << 16) | wcol_g

    return WindowBinning(inst_gauss=inst_gauss, win_tile=win_tile,
                         win_first=win_first, win_start=win_start_pad,
                         win_off=win_off, win_len=win_len, win_rcg=win_rcg,
                         enum_kernel_row=enum_kernel_row,
                         enum_start=offsets, enum_cnt=cnt,
                         num_instances=tight, num_dropped=num_dropped)



def instance_budget(n: int, chunk: int, budget_factor: float) -> int:
    b = int(budget_factor * n)
    return -(-b // chunk) * chunk


def _strided_span(lo, hi, n_local, stride: int, phase):
    """Map a GLOBAL index span [lo, hi) to the LOCAL indices l whose
    global position phase + l*stride falls inside it:
    l in [ceil((lo-phase)/stride), ceil((hi-phase)/stride)), clipped."""
    if stride == 1:
        return (jnp.clip(lo, 0, n_local), jnp.clip(hi, 0, n_local))
    p = jnp.asarray(phase, jnp.int32)
    return (jnp.clip(-((p - lo) // stride), 0, n_local),
            jnp.clip(-((p - hi) // stride), 0, n_local))


def _tile_bbox(u, v, ex, ey, valid, ts, tiles_x, tiles_y,
               row_stride: int = 1, row_phase=0,
               col_stride: int = 1, col_phase=0):
    """Per-gaussian candidate-tile bbox (x0, y0, bw, cnt) in LOCAL tile
    coordinates.

    With strides of 1 the local grid is the global grid. With
    ``row_stride = Dy`` / ``col_stride = Dx`` the caller owns only the 2D-
    INTERLEAVED global tiles (row ≡ row_phase mod Dy, col ≡ col_phase mod
    Dx) — device (py, px) of a Dy x Dx grid owns a stratified lattice of
    tiles, which load-balances center-heavy scenes to ~0.95 at D=8 where
    contiguous bands measured 0.74 and whole-row interleaving 0.84
    (VERDICT r3 missing #2). Every enumerated (local row, local col) cell
    IS an owned candidate — zero enumeration waste. Phases may be traced
    scalars (``axis_index`` inside shard_map)."""
    gx_hi = tiles_x * col_stride
    gy_hi = tiles_y * row_stride
    gx0 = jnp.clip(jnp.floor((u - ex) / ts).astype(jnp.int32), 0, gx_hi)
    gx1 = jnp.clip(jnp.ceil((u + ex) / ts).astype(jnp.int32), 0, gx_hi)
    gy0 = jnp.clip(jnp.floor((v - ey) / ts).astype(jnp.int32), 0, gy_hi)
    gy1 = jnp.clip(jnp.ceil((v + ey) / ts).astype(jnp.int32), 0, gy_hi)
    x0, x1 = _strided_span(gx0, gx1, tiles_x, col_stride, col_phase)
    y0, y1 = _strided_span(gy0, gy1, tiles_y, row_stride, row_phase)
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
                                             "tile_size", "row_stride",
                                             "col_stride"))
def count_instances(proj: Projected, *, tiles_x: int, tiles_y: int,
                    tile_size: int, row_stride: int = 1, row_phase=0,
                    col_stride: int = 1, col_phase=0) -> jax.Array:
    """Bbox instance count (no sort): an upper bound on the tight count,
    used to size the static enumeration budget."""
    u, v = proj.u, proj.v
    _, _, _, cnt = _tile_bbox(u, v, proj.ex, proj.ey,
                              proj.valid, float(tile_size), tiles_x, tiles_y,
                              row_stride, row_phase, col_stride, col_phase)
    return jnp.sum(cnt)


def _expand_instances(u, v, ex, ey, ca, cb, cc, qmax, valid, *, tiles_x,
                      tiles_y, tile_size, budget, n, row_stride=1,
                      row_phase=0, col_stride=1, col_phase=0):
    """Enumerate (depth-rank, tile) instance pairs from depth-SORTED per-
    gaussian arrays; tight-filtered pairs get the sentinel tile ``num_tiles``.
    Returns (tile [B], g [B], total bbox count, tight count)."""
    ts = float(tile_size)
    num_tiles = tiles_x * tiles_y
    x0, y0, bw, cnt = _tile_bbox(u, v, ex, ey, valid,
                                 ts, tiles_x, tiles_y, row_stride, row_phase,
                                 col_stride, col_phase)

    offsets = jnp.cumsum(cnt) - cnt  # exclusive
    total = offsets[-1] + cnt[-1]

    # --- expand to instances (slot j -> (gaussian rank, tile)).
    # "segment id from counts" via scatter-add of start markers + cumsum:
    # jnp.searchsorted costs ~128ms for 1M queries on TPU, this costs ~0.2ms.
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop",  # empty gaussians stack marks at the same slot
        indices_are_sorted=True)  # offsets monotone (cumsum of counts)
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total
    # ONE row gather instead of ten B-sized gathers: on TPU a B-element
    # gather costs ~7.6ms/1M regardless of row width, so coalescing columns
    # is a big saving on this stage.
    gtab = jnp.stack([
        offsets.astype(jnp.float32), jnp.maximum(bw, 1).astype(jnp.float32),
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        u, v, ca, cb, cc, qmax], axis=1)  # [N,10]
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
    trow_g = jnp.asarray(row_phase, jnp.int32) + trow * row_stride
    tcol_g = jnp.asarray(col_phase, jnp.int32) + tcol * col_stride

    # --- tight filter: exact ellipse/tile-rect intersection
    min_q = _rect_min_q(grow[:, 4], grow[:, 5], grow[:, 6], grow[:, 7],
                        grow[:, 8], tcol_g.astype(jnp.float32) * ts,
                        trow_g.astype(jnp.float32) * ts, ts)
    keep = inside & (min_q <= grow[:, 9])
    tile = jnp.where(keep, tile, num_tiles)  # sentinel tile
    tight = jnp.sum(keep.astype(jnp.int32))
    return tile, g, total, tight, offsets, cnt


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "budget",
                              "row_stride", "col_stride"))
def count_instances_tight(proj: Projected, *, tiles_x: int, tiles_y: int,
                          tile_size: int, budget: int, row_stride: int = 1,
                          row_phase=0, col_stride: int = 1,
                          col_phase=0) -> jax.Array:
    """Exact tight instance count (runs the enumeration + filter, no sort);
    used to right-size ``kernel_budget``. ``budget`` must be >= the bbox
    count (from ``count_instances``)."""
    n = proj.depth.shape[0]
    # the count is order-independent: no depth sort (an f32-key argsort
    # costs ~18s of XLA compile that a budget probe should not pay)
    tight = _expand_instances(
        proj.u, proj.v, proj.ex, proj.ey,
        proj.ca, proj.cb, proj.cc, proj.qmax, proj.valid,
        tiles_x=tiles_x, tiles_y=tiles_y, tile_size=tile_size, budget=budget,
        n=n, row_stride=row_stride, row_phase=row_phase,
        col_stride=col_stride, col_phase=col_phase)[3]
    return tight


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_size", "chunk",
                              "budget", "kernel_budget", "wpg",
                              "row_stride", "col_stride"))
def count_windows(proj: Projected, *, tiles_x: int, tiles_y: int,
                  tile_size: int, chunk: int, budget: int,
                  kernel_budget: int, wpg: int = 1, row_stride: int = 1,
                  row_phase=0, col_stride: int = 1,
                  col_phase=0) -> jax.Array:
    """Exact window count bin_windows will produce (before window-shedding):
    sum over tiles of max(ceil(n_keep/chunk), 1) rounded up per tile to a
    multiple of ``wpg``. Used to right-size the static grid so padding
    windows don't burn grid steps (~0.3us each)."""
    n = proj.depth.shape[0]
    num_tiles = tiles_x * tiles_y
    ts = float(tile_size)
    u, v = proj.u, proj.v
    x0, y0, bw, cnt = _tile_bbox(u, v, proj.ex, proj.ey,
                                 proj.valid, ts, tiles_x, tiles_y,
                                 row_stride, row_phase,
                                 col_stride, col_phase)
    offsets = jnp.cumsum(cnt) - cnt
    total = offsets[-1] + cnt[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
        1, mode="drop", indices_are_sorted=True)  # offsets monotone: XLA's
    # sorted-scatter path skips the serial SMEM loop (~0.9ms at N=100k)
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
    inside = j < total
    etab = jnp.stack([
        offsets.astype(jnp.float32), jnp.maximum(bw, 1).astype(jnp.float32),
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        u, v, proj.ca, proj.cb, proj.cc,
        proj.qmax,
    ] + [jnp.zeros((n,), jnp.float32)] * 6, axis=1)
    erow = etab.at[g].get(mode="clip")
    local = j - erow[:, 0].astype(jnp.int32)
    bw_g = erow[:, 1]
    row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
    col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
    tcol = erow[:, 2].astype(jnp.int32) + col
    trow = erow[:, 3].astype(jnp.int32) + row.astype(jnp.int32)
    tile = trow * tiles_x + tcol
    trow_g = jnp.asarray(row_phase, jnp.int32) + trow * row_stride
    tcol_g = jnp.asarray(col_phase, jnp.int32) + tcol * col_stride
    min_q = _rect_min_q(erow[:, 4], erow[:, 5], erow[:, 6], erow[:, 7],
                        erow[:, 8], tcol_g.astype(jnp.float32) * ts,
                        trow_g.astype(jnp.float32) * ts, ts)
    keep = inside & (min_q <= erow[:, 9])
    tight = jnp.sum(keep.astype(jnp.int32))
    n_t = jnp.zeros((num_tiles + 1,), jnp.int32).at[
        jnp.where(keep, tile, num_tiles)].add(1, mode="drop")[:num_tiles]
    over = tight > kernel_budget
    scale = jnp.where(over, kernel_budget / jnp.maximum(tight, 1), 1.0)
    n_keep = jnp.where(
        over, jnp.floor(n_t.astype(jnp.float32) * scale).astype(jnp.int32),
        n_t)
    # mirror bin_windows' 8-aligned first windows: tile_start is the
    # exclusive prefix of the per-tile tight counts in the sorted stream
    tile_start = jnp.cumsum(n_t) - n_t
    lead = tile_start - (tile_start // 8) * 8
    ng = jnp.maximum(-(-(-(-(lead + n_keep) // chunk)) // wpg), 1)
    return jnp.sum(ng) * wpg


def bucket_budget(count: int, chunk: int, *, slack: float = 1.05,
                  step: float = 1.12) -> int:
    """Round a measured instance count up to a geometric bucket so repeated
    renders reuse compiled programs while keeping <= ~12% budget overshoot
    (r3.2: tightened from 25% — every B-sized binning/glue op scales with
    the bucket, worth ~0.5ms/frame on the bench scene, and the persistent
    compilation cache absorbs the extra program variants)."""
    import math

    need = max(int(count * slack), chunk)
    k = math.ceil(math.log(need / chunk, step))
    return -(-int(chunk * step ** max(k, 0)) // chunk) * chunk
