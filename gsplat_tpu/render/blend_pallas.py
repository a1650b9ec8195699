"""Pallas TPU blend kernels: tile-based alpha compositing, forward + backward.

TPU-native replacement for the reference's rasterization core — the GLSL
vertex/fragment shaders + GPU blend unit (gaussians_selection.js:661-800,
1033-1038) — plus the analytic backward pass the reference lacks entirely.

Design (see gsplat_tpu/render/tiles.py for the binning that feeds this):

- The depth-sorted instance stream stays DENSE in (tile, depth) order; each
  grid step double-buffer-DMAs one ``CHUNK``-row *window* of it from HBM at
  a dynamic offset (scalar-prefetched ``win_start``). ``win_tile[k]`` names
  the owning tile; consecutive windows of one tile revisit the same output
  block, which therefore stays resident in VMEM and doubles as the
  per-pixel carry (premultiplied RGB + transmittance). Dead windows
  (``win_len == 0``: per-tile padding or grid slack) skip both DMA and
  compute, costing only the ~0.45us grid step.
- All compute is VPU: the Mahalanobis quadratic form is broadcast
  arithmetic in tile-local pixel coordinates (f32-exact), and the
  per-gaussian gradient moments are axis reductions over dx/dy products.
  The MXU is deliberately idle — every matmul formulation here is either a
  K<=8 contraction (too skinny to feed the systolic array) or needs f32
  accuracy, where a HIGHEST-precision (bf16x6) 128x1024 matmul costs ~2ms
  over the whole grid and Mosaic does not lower bf16x3. Reducing over dx/dy
  directly also avoids the catastrophic (x/sigma)^2 cancellation the
  monomial-reconstruction (dq @ F^T) formulation suffers on small splats.
- Front-to-back compositing inside a window is an exclusive cumulative
  product of (1 - alpha) along the gaussian (sublane) axis — a log2(CHUNK)
  shift-multiply scan — seeded by the tile's carried transmittance.
- Backward re-walks the windows in the same order with the standard
  suffix-sum trick: S_i = D - prefix_i, where the per-pixel total
  D = C . dC + T_final . dT comes from the forward residuals. Each window
  writes grad rows into its own disjoint output block — no atomics; the
  instance->gaussian reduction happens outside via the binning's
  enumeration-order segment sum (gsplat_tpu/render/api.py).

Forward output layout: out[T, 8, P] rows = [r, g, b, transmittance,
best_weight, best_label, unused, unused] (label rows only when
``with_labels``); P = tile_size^2 pixels, row-major within the tile.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Parameter row layout of the packed per-instance matrix [B_pad, 16].
# P_GID carries the ORIGINAL gaussian index as f32 (exact for N < 2^24) so
# the visibility kernel can reduce straight onto original-order arrays.
(P_MX, P_MY, P_CA, P_CB, P_CC, P_OP, P_R, P_G, P_B, P_VALID, P_LABEL,
 P_GID) = range(12)
PARAM_ROWS = 16

def _scan_shift(x: jax.Array, combine, identity: float) -> jax.Array:
    """Inclusive scan along axis 0 (sublanes) via log2(n) shift-combines."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < n:
        sh = pltpu.roll(x, shift=k, axis=0)
        x = combine(x, jnp.where(row >= k, sh, identity))
        k *= 2
    return x


def _cumprod_rows(x):
    return _scan_shift(x, jnp.multiply, 1.0)


def _cumsum_rows(x):
    return _scan_shift(x, jnp.add, 0.0)


def _shift_down_one(x: jax.Array, fill: float) -> jax.Array:
    """y[i] = x[i-1], y[0] = fill (exclusive-scan helper)."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= 1, pltpu.roll(x, shift=1, axis=0), fill)


def _pixel_coords(tile_size: int):
    """Tile-local pixel-center coordinates, each [(1, P)]."""
    p = tile_size * tile_size
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (pid % tile_size).astype(jnp.float32) + 0.5
    py = (pid // tile_size).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alphas(params, rcg, tile_size: int, tiles_x: int,
                  alpha_min: float, alpha_max: float):
    """Shared forward math: per-(gaussian, pixel) alphas for one chunk.

    params: [(chunk, 16)] block. Returns (alpha [(chunk, P)], aux dict).
    ``rcg`` is the tile's GLOBAL (row << 16 | col) — it differs from the
    local tile id's decode under the sharded renderer's 2D-interleaved
    tile ownership; the quadratic form runs in global pixel coordinates
    and the instance means are never shifted.
    The quadratic form runs on the VPU (broadcast FMAs in tile-local f32),
    not the MXU — the K=8 monomial contraction is far too skinny to feed the
    systolic array efficiently.
    """
    x0 = jax.lax.bitwise_and(rcg, 0xFFFF) * tile_size
    y0 = jax.lax.shift_right_logical(rcg, 16) * tile_size
    mx = params[:, P_MX:P_MX + 1] - x0.astype(jnp.float32)
    my = params[:, P_MY:P_MY + 1] - y0.astype(jnp.float32)
    ca = params[:, P_CA:P_CA + 1]
    cb = params[:, P_CB:P_CB + 1]
    cc = params[:, P_CC:P_CC + 1]
    op = params[:, P_OP:P_OP + 1]
    validf = params[:, P_VALID:P_VALID + 1]

    px, py = _pixel_coords(tile_size)
    dx = px - mx                                   # (chunk, P)
    dy = py - my
    q = ((ca * dx + (2.0 * cb) * dy) * dx + cc * dy * dy)
    raw = op * jnp.exp(-0.5 * q) * validf
    alpha = jnp.minimum(raw, alpha_max)
    alpha = jnp.where(alpha >= alpha_min, alpha, 0.0)
    aux = dict(dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, op=op, raw=raw)
    return alpha, aux


def _accumulate_rgb(out_ref, params, w, t_carry, incl):
    # Per-channel sublane reduction on the VPU (f32-exact); the matmul
    # formulation colors^T @ w is a 3-row output — pure MXU waste.
    for ch in range(3):
        col = params[:, P_R + ch:P_R + ch + 1]     # (chunk, 1)
        out_ref[0, ch:ch + 1, :] += jnp.sum(col * w, axis=0, keepdims=True)
    out_ref[0, 3:4, :] = t_carry * incl[-1:, :]


def _accumulate_labels(out_ref, params, w):
    best_j = jnp.argmax(w, axis=0)[None, :]        # first max wins
    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    onehot = (row == best_j).astype(jnp.float32)
    mw = jnp.max(w, axis=0)[None, :]               # (1, P)
    labf = params[:, P_LABEL:P_LABEL + 1]          # (chunk, 1)
    lab_best = jnp.sum(labf * onehot, axis=0)[None, :]
    better = mw > out_ref[0, 4:5, :]
    out_ref[0, 4:5, :] = jnp.where(better, mw, out_ref[0, 4:5, :])
    out_ref[0, 5:6, :] = jnp.where(better, lab_best, out_ref[0, 5:6, :])




# ---------------------------------------------------------------------------
# Window kernels: the instance stream stays DENSE in (tile, depth) sorted
# order; each grid step double-buffer-DMAs one window's param rows from HBM
# at a dynamic row offset (scalar-prefetched win_start). Window starts are
# 8-ALIGNED by construction (tiles.py bin_windows round 3), so the kernel
# fetches and computes EXACTLY ``chunk`` rows — the r2 design fetched
# chunk+8 rows and computed all of them (+12% wasted VPU work at chunk=64).
# The 0..7 foreign lead rows of each tile's first window are masked via the
# scalar-prefetched ``win_off``.
# ---------------------------------------------------------------------------


# The kernel-facing params array is 128 lanes wide (columns 16+ zero): XLA
# pads the minor dim of a [R, 16] f32 array to 128 lanes in HBM anyway, and
# Mosaic cannot DMA-slice a 16-wide window out of a 128-lane-tiled row — so
# width 128 costs no extra HBM and makes the window DMA legal.
PARAM_LANES = 128


def _win_rowmask(off, win_len_k, rows_total: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_total, 1), 0)
    return ((rows >= off) & (rows < off + win_len_k)).astype(jnp.float32)


def _win_dma(params_hbm, pbuf, psem, win_start, gidx, chunk: int, wpg: int):
    """One DMA covers the grid step's whole window GROUP (wpg consecutive
    chunk-row windows of one tile — contiguous by construction)."""
    slot = jax.lax.rem(gidx, 2)
    base = pl.multiple_of(win_start[gidx * wpg], 8)
    return pltpu.make_async_copy(
        params_hbm.at[pl.ds(base, wpg * chunk)],
        pbuf.at[slot], psem.at[slot])


def _win_prologue(g, params_hbm, pbuf, psem, win_start, win_len, chunk: int,
                  wpg: int):
    """Start this step's DMA on step 0, prefetch next step's, wait for ours.

    Dead groups (win_len[first] == 0: per-tile padding or grid slack —
    windows fill front-to-back within a tile, so a dead first window means
    the whole group is dead) skip their DMA entirely — start and wait are
    gated by the same condition, so the double-buffer semaphores stay
    balanced."""
    ng = pl.num_programs(0)

    @pl.when((g == 0) & (win_len[0] > 0))
    def _():
        _win_dma(params_hbm, pbuf, psem, win_start, g, chunk, wpg).start()

    @pl.when(g + 1 < ng)
    def _():
        @pl.when(win_len[(g + 1) * wpg] > 0)
        def _():
            _win_dma(params_hbm, pbuf, psem, win_start, g + 1, chunk,
                     wpg).start()

    @pl.when(win_len[g * wpg] > 0)
    def _():
        _win_dma(params_hbm, pbuf, psem, win_start, g, chunk, wpg).wait()


def _fwd_win_kernel(win_tile, win_first, win_start, win_off, win_len,
                    win_rcg, params_hbm, out_ref, pbuf, psem, *, chunk: int, wpg: int,
                    tile_size: int, tiles_x: int, alpha_min: float,
                    alpha_max: float, with_labels: bool, early_eps: float):
    g = pl.program_id(0)
    w0 = g * wpg
    t = win_tile[w0]
    rcg = win_rcg[w0]

    @pl.when(win_first[w0] == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[0, 3:4, :] = jnp.ones_like(out_ref[0, 3:4, :])
        if with_labels:
            out_ref[0, 5:6, :] = jnp.full_like(out_ref[0, 5:6, :], -1.0)

    _win_prologue(g, params_hbm, pbuf, psem, win_start, win_len, chunk, wpg)
    buf = pbuf[jax.lax.rem(g, 2)]

    for h in range(wpg):                 # unrolled: wpg is static
        wi = w0 + h
        t_carry = out_ref[0, 3:4, :]
        live = win_len[wi] > 0
        if early_eps > 0:
            live &= jnp.max(t_carry) >= early_eps

        @pl.when(live)
        def _compute(h=h, wi=wi, t_carry=t_carry):
            params = buf[h * chunk:(h + 1) * chunk, :PARAM_ROWS]
            alpha, _ = _chunk_alphas(params, rcg, tile_size, tiles_x,
                                     alpha_min, alpha_max)
            alpha = alpha * _win_rowmask(win_off[wi], win_len[wi], chunk)
            incl = _cumprod_rows(1.0 - alpha)
            excl = _shift_down_one(incl, 1.0)
            w = t_carry * excl * alpha
            _accumulate_rgb(out_ref, params, w, t_carry, incl)
            if with_labels:
                _accumulate_labels(out_ref, params, w)


def _fwd_win_vis_kernel(win_tile, win_first, win_start, win_off, win_len,
                        win_rcg, params_hbm, out_ref, w_ref, pbuf, psem, *, chunk: int,
                        wpg: int, tile_size: int, tiles_x: int,
                        alpha_min: float, alpha_max: float,
                        with_labels: bool):
    """Window forward that also records each instance's max blend weight
    (per-gaussian visibility evidence for the occlusion-aware vote) and its
    ORIGINAL gaussian index, for a segment-max reduction outside the
    kernel."""
    g = pl.program_id(0)
    w0 = g * wpg
    t = win_tile[w0]
    rcg = win_rcg[w0]

    @pl.when(win_first[w0] == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[0, 3:4, :] = jnp.ones_like(out_ref[0, 3:4, :])
        if with_labels:
            out_ref[0, 5:6, :] = jnp.full_like(out_ref[0, 5:6, :], -1.0)

    _win_prologue(g, params_hbm, pbuf, psem, win_start, win_len, chunk, wpg)
    w_ref[...] = jnp.zeros_like(w_ref)
    w_ref[:, 1:2] = jnp.full_like(w_ref[:, 1:2], -1.0)  # gid sentinel
    buf = pbuf[jax.lax.rem(g, 2)]

    for h in range(wpg):
        wi = w0 + h

        @pl.when(win_len[wi] > 0)
        def _compute(h=h, wi=wi):
            params = buf[h * chunk:(h + 1) * chunk, :PARAM_ROWS]
            rowmask = _win_rowmask(win_off[wi], win_len[wi], chunk)
            alpha, _ = _chunk_alphas(params, rcg, tile_size, tiles_x,
                                     alpha_min, alpha_max)
            alpha = alpha * rowmask
            incl = _cumprod_rows(1.0 - alpha)
            excl = _shift_down_one(incl, 1.0)
            t_carry = out_ref[0, 3:4, :]
            w = t_carry * excl * alpha
            _accumulate_rgb(out_ref, params, w, t_carry, incl)
            if with_labels:
                _accumulate_labels(out_ref, params, w)
            wmax = jnp.max(w, axis=1, keepdims=True)   # (chunk, 1)
            w_ref[h * chunk:(h + 1) * chunk, 0:1] = wmax
            w_ref[h * chunk:(h + 1) * chunk, 1:2] = jnp.where(
                rowmask > 0, params[:, P_GID:P_GID + 1], -1.0)


def _bwd_win_kernel(win_tile, win_first, win_start, win_off, win_len,
                    win_rcg, params_hbm, g_ref, fwd_ref, dout_ref, pbuf, psem,
                    carry_ref, *, chunk: int, wpg: int, tile_size: int,
                    tiles_x: int, alpha_min: float, alpha_max: float,
                    early_eps: float):
    """Backward over windows. Writes per-kernel-row grad rows [chunk, 16]
    (disjoint per grid step — no overlap hazards); masked rows are zero.
    The instance -> gaussian reduction happens outside via the binning's
    enum_kernel_row map + an enumeration-order segment sum (no scatter-add:
    ~4.8ms -> ~1.5ms at 206k instances on v5e).

    The per-pixel suffix seed D = C . dC + T_final . dT is computed HERE
    from the raw cotangent block ``g_ref`` and the forward-output residual
    ``fwd_ref`` (4 FMAs on [1, P] per window) instead of as a separate XLA
    pass over [T, 8, P] — the strided-sublane slice+reduce cost ~1.4ms/frame
    outside the kernel (scripts/profile_vjp_glue.py 'd seed')."""
    g = pl.program_id(0)
    w0 = g * wpg
    t = win_tile[w0]
    rcg = win_rcg[w0]

    @pl.when(win_first[w0] == 1)
    def _init():
        carry_ref[0:1, :] = jnp.ones_like(carry_ref[0:1, :])
        carry_ref[1:2, :] = jnp.zeros_like(carry_ref[1:2, :])

    _win_prologue(g, params_hbm, pbuf, psem, win_start, win_len, chunk, wpg)
    dout_ref[...] = jnp.zeros_like(dout_ref)
    buf = pbuf[jax.lax.rem(g, 2)]

    for h in range(wpg):
        wi = w0 + h
        live = win_len[wi] > 0
        if early_eps > 0:
            live &= jnp.max(carry_ref[0:1, :]) >= early_eps

        @pl.when(live)
        def _(h=h, wi=wi):
            params = buf[h * chunk:(h + 1) * chunk, :PARAM_ROWS]
            rowmask = _win_rowmask(win_off[wi], win_len[wi], chunk)
            alpha, aux = _chunk_alphas(params, rcg, tile_size, tiles_x,
                                       alpha_min, alpha_max)
            alpha = alpha * rowmask

            incl = _cumprod_rows(1.0 - alpha)
            excl = _shift_down_one(incl, 1.0)
            t_carry = carry_ref[0:1, :]
            t_excl = t_carry * excl
            w = t_excl * alpha

            grgb = g_ref[0, 0:3, :]
            d = (fwd_ref[0, 0:1, :] * grgb[0:1, :]
                 + fwd_ref[0, 1:2, :] * grgb[1:2, :]
                 + fwd_ref[0, 2:3, :] * grgb[2:3, :]
                 + fwd_ref[0, 3:4, :] * g_ref[0, 3:4, :])
            colors = params[:, P_R:P_B + 1]
            cg = (colors[:, 0:1] * grgb[0:1, :]
                  + colors[:, 1:2] * grgb[1:2, :]
                  + colors[:, 2:3] * grgb[2:3, :])
            contrib = w * cg
            p_incl = carry_ref[1:2, :] + _cumsum_rows(contrib)
            s = d - p_incl

            # dq = -0.5 alpha dalpha with dalpha = t_excl cg - s/(1-alpha);
            # fold alpha through: alpha t_excl cg = contrib (already
            # computed), alpha s/(1-alpha) = s ratio — one fewer elementwise
            # pass, and the live_px select is subsumed by `unclamped`
            # (alpha==0 => ratio==0, contrib==0)
            unclamped = (alpha > 0.0) & (aux["raw"] < alpha_max)
            ratio = alpha / (1.0 - alpha)
            dq = jnp.where(unclamped, -0.5 * (contrib - s * ratio), 0.0)

            dx, dy = aux["dx"], aux["dy"]
            ca, cb, cc, op = aux["ca"], aux["cb"], aux["cc"], aux["op"]
            t1 = dq * dx
            t2 = dq * dy

            def _rsum(x):
                return jnp.sum(x, axis=1, keepdims=True)

            cx = _rsum(t1)
            cy = _rsum(t2)
            d_ca = _rsum(t1 * dx)
            d_cc = _rsum(t2 * dy)
            d_cb = 2.0 * _rsum(t1 * dy)
            s_1 = _rsum(dq)
            d_mx = -2.0 * ca * cx - 2.0 * cb * cy
            d_my = -2.0 * cc * cy - 2.0 * cb * cx
            d_op = -2.0 * s_1 / jnp.maximum(op, 1e-20)

            d_col = jnp.concatenate(
                [_rsum(w * grgb[ch:ch + 1, :]) for ch in range(3)], axis=1)

            zero = jnp.zeros_like(d_mx)
            dout_ref[h * chunk:(h + 1) * chunk, :] = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_col, zero, zero,
                 zero, zero, zero, zero, zero], axis=1)

            carry_ref[0:1, :] = t_carry * incl[-1:, :]
            carry_ref[1:2, :] = p_incl[-1:, :]


def blend_windows_fwd(params, win_tile, win_first, win_start, win_off,
                      win_len, win_rcg, *, chunk, wpg, tile_size, tiles_x, num_tiles,
                      alpha_min, alpha_max, with_labels, interpret,
                      early_eps):
    """Forward window blend. params: [R, 16] dense sorted instance rows
    (R >= max(win_start) + wpg*chunk). Returns [num_tiles, 8, P]. Each grid
    step handles ``wpg`` consecutive same-tile windows (one DMA, carry
    in-register) — the binning guarantees groups never span tiles."""
    p = tile_size * tile_size
    k_static = win_tile.shape[0]
    assert k_static % wpg == 0, (k_static, wpg)
    kernel = functools.partial(
        _fwd_win_kernel, chunk=chunk, wpg=wpg, tile_size=tile_size,
        tiles_x=tiles_x, alpha_min=alpha_min, alpha_max=alpha_max,
        with_labels=with_labels, early_eps=early_eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k_static // wpg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, p), lambda k, wt, wf, ws, wo, wl, wrg:
                               (wt[k * wpg], 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wpg * chunk, PARAM_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flops_est = 2 * k_static * chunk * p * 25
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_est,
            bytes_accessed=k_static * chunk * 64 + num_tiles * 32 * p,
            transcendentals=k_static * chunk * p),
        interpret=interpret,
    )(win_tile, win_first, win_start, win_off, win_len, win_rcg, params)


def blend_windows_vis(params, win_tile, win_first, win_start, win_off,
                      win_len, win_rcg, *, chunk, wpg, tile_size, tiles_x, num_tiles,
                      alpha_min, alpha_max, with_labels, interpret):
    """Forward window blend + per-row (max blend weight, gaussian index)
    pairs [K*chunk, 8] for the visibility vote. Not differentiable."""
    p = tile_size * tile_size
    k_static = win_tile.shape[0]
    assert k_static % wpg == 0, (k_static, wpg)
    kernel = functools.partial(
        _fwd_win_vis_kernel, chunk=chunk, wpg=wpg, tile_size=tile_size,
        tiles_x=tiles_x, alpha_min=alpha_min, alpha_max=alpha_max,
        with_labels=with_labels)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k_static // wpg,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, 8, p),
                         lambda k, wt, wf, ws, wo, wl, wrg: (wt[k * wpg], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpg * chunk, 8),
                         lambda k, wt, wf, ws, wo, wl, wrg: (k, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wpg * chunk, PARAM_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
            jax.ShapeDtypeStruct((k_static * chunk, 8), jnp.float32),
        ),
        interpret=interpret,
    )(win_tile, win_first, win_start, win_off, win_len, win_rcg, params)


def blend_windows_bwd(params, win_tile, win_first, win_start, win_off,
                      win_len, win_rcg, g, fwd_out, *, chunk, wpg, tile_size, tiles_x,
                      num_tiles, alpha_min, alpha_max, interpret, early_eps):
    """Backward window blend. ``g`` is the raw output cotangent [T, 8, P]
    (rows 0-3 = dRGB, dT; label rows ignored — non-differentiable) and
    ``fwd_out`` the forward output residual; the per-pixel suffix seed D is
    computed in-kernel. Returns [K*chunk, 16] grad rows in kernel-row order
    (the binning's enum_kernel_row indexes them); dead rows are zero."""
    p = tile_size * tile_size
    k_static = win_tile.shape[0]
    assert k_static % wpg == 0, (k_static, wpg)
    kernel = functools.partial(
        _bwd_win_kernel, chunk=chunk, wpg=wpg, tile_size=tile_size,
        tiles_x=tiles_x, alpha_min=alpha_min, alpha_max=alpha_max,
        early_eps=early_eps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(k_static // wpg,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            # full 8-row tile blocks: Mosaic requires sublane blocks
            # divisible by 8 (a (1, 4, p) block fails to lower), so the
            # backward pass fetches all 8 rows and reads rows 0..3
            pl.BlockSpec((1, 8, p),
                         lambda k, wt, wf, ws, wo, wl, wrg: (wt[k * wpg], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p),
                         lambda k, wt, wf, ws, wo, wl, wrg: (wt[k * wpg], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpg * chunk, PARAM_ROWS),
                               lambda k, wt, wf, ws, wo, wl, wrg: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wpg * chunk, PARAM_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, p), jnp.float32),
        ],
    )
    flops_est = 2 * k_static * chunk * p * 60
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (k_static * chunk, PARAM_ROWS), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_est,
            bytes_accessed=k_static * chunk * 128 + num_tiles * 32 * p,
            transcendentals=k_static * chunk * p),
        interpret=interpret,
    )(win_tile, win_first, win_start, win_off, win_len, win_rcg, params, g,
  fwd_out)


def _cumsum_rows_kernel(x_ref, o_ref, carry_ref, *, blk: int, total: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    x = x_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + i * blk
    x = jnp.where(rows < total, x, 0.0)   # mask last-block padding reads
    cs = _cumsum_rows(x)                  # log2(blk) shift-adds
    o_ref[...] = cs + carry_ref[...]
    carry_ref[...] = carry_ref[...] + cs[-1:, :]


def cumsum_rows(x: jax.Array, *, interpret: bool = False,
                blk: int = 1024) -> jax.Array:
    """Inclusive cumsum of [B, C] along axis 0 in ONE HBM pass.

    XLA's cumsum lowers to a log-depth composition of shifted adds —
    ~log2(B) full-array passes (measured 0.49 ms at [224k, 16] on v5e,
    scripts/profile_proj_glue.py). This kernel streams blocks through VMEM
    with a [1, C] carry across the sequential grid: one read + one write
    of the array, an in-block log2(blk) shift-add scan, ~0.1 ms at the
    same shape. Exact prefix sums up to f32 reassociation."""
    b, c = x.shape
    grid = -(-b // blk)
    return pl.pallas_call(
        functools.partial(_cumsum_rows_kernel, blk=blk, total=b),
        grid=(grid,),
        in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, c), x.dtype),
        interpret=interpret,
    )(x)


def tiles_to_image(tile_rows: jax.Array, tiles_x: int, tiles_y: int,
                   tile_size: int, width: int, height: int) -> jax.Array:
    """[T, C, P] tile rows -> [H, W, C] image (crop padding)."""
    c = tile_rows.shape[1]
    img = tile_rows.reshape(tiles_y, tiles_x, c, tile_size, tile_size)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * tile_size, tiles_x * tile_size, c)
    return img[:height, :width]
