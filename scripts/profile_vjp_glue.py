"""Time each op of the blend VJP glue (api._blend_windows_bwd_rule) on chip.

The glue is everything between the backward Pallas kernel's [K*chunk, 16]
grad rows and the [N, 16] per-gaussian gradient: the enum-order row gather,
the [B, ng] cumsum, and the two boundary row gathers. bench.py shows the
fwd+bwd op at ~13.8ms with kernels at ~4.1 + ~6.3 — this attributes the rest.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.render import blend_pallas
from gsplat_tpu.render.api import _window_params, pack_table
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import bin_windows

W, H, N = 800, 608, 100_000
ITERS = 20
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
rc = cfg.raster
tiles_x, tiles_y = tile_grid(W, H, rc.tile_size)
num_tiles = tiles_x * tiles_y
chunk = cfg.tiles.chunk

proj = jax.jit(lambda: project(scene, camp, W, H, rc, z_near=cfg.camera.z_near,
                               z_far=cfg.camera.z_far))()
from gsplat_tpu.render.api import measure_budgets
budget, kernel_budget, num_windows = measure_budgets(scene, cam, cfg)
binning = jax.jit(lambda: bin_windows(
    proj, tiles_x=tiles_x, tiles_y=tiles_y, tile_size=rc.tile_size,
    chunk=chunk, budget=budget, kernel_budget=kernel_budget,
    num_windows=num_windows))()
ptab = pack_table(proj, scene.labels)
params = jax.jit(lambda: _window_params(ptab, binning.inst_gauss, chunk))()
k_static = binning.win_tile.shape[0]
krows = k_static * chunk
print(f"B={budget} K={k_static} krows={krows}")

drows = jax.device_put(jnp.zeros((krows, blend_pallas.PARAM_ROWS),
                                 jnp.float32) + 0.5)
enum_kernel_row = binning.enum_kernel_row
enum_start, enum_cnt = binning.enum_start, binning.enum_cnt
ng = blend_pallas.P_VALID


def timeit(name, fn, *args):
    """fori_loop dependency-chain timing (bench.py methodology): the carry
    perturbs the first arg so XLA cannot hoist, and only two host syncs
    happen per measurement — the axon tunnel's per-dispatch latency would
    otherwise swamp sub-ms ops."""
    def stage(c, *a):
        a0 = (a[0] + c * 1e-30
              if getattr(a[0], "dtype", None) == jnp.float32 else a[0])
        o = fn(a0, *a[1:])
        leaves = jax.tree_util.tree_leaves(o)
        return sum(x.reshape(-1)[0].astype(jnp.float32) * 1e-30
                   for x in leaves)

    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: stage(c, *a), 0.0)

    float(run(1, *args))
    def timed(n):
        t0 = time.perf_counter()
        float(run(n, *args))
        return time.perf_counter() - t0
    dt_n = min(timed(ITERS + 1), timed(ITERS + 1))
    dt_1 = min(timed(1), timed(1))
    dt = max((dt_n - dt_1) / ITERS, 1e-9) * 1e3
    print(f"{name:38s}{dt:8.3f} ms")
    return dt


# 1. row gather of grad rows into enumeration order + mask
def step_gather(drows, ekr):
    rows = jnp.where(
        (ekr < krows)[:, None],
        drows.at[jnp.minimum(ekr, krows - 1)].get(mode="clip")[:, :ng], 0.0)
    return rows

rows = jax.jit(step_gather)(drows, enum_kernel_row)
timeit("grad-row gather [B,16]->[B,9]+mask", step_gather, drows,
       enum_kernel_row)

# 2. cumsum
timeit("cumsum [B,9]", lambda r: jnp.cumsum(r, axis=0), rows)
cs = jax.jit(lambda r: jnp.cumsum(r, axis=0))(rows)

# 3. boundary gathers
def step_bounds(cs, enum_start, enum_cnt):
    hi = cs.at[jnp.clip(enum_start + enum_cnt - 1, 0, budget - 1)].get(
        mode="clip")
    lo = jnp.where((enum_start > 0)[:, None],
                   cs.at[jnp.maximum(enum_start - 1, 0)].get(mode="clip"),
                   0.0)
    return jnp.where((enum_cnt > 0)[:, None], hi - lo, 0.0)

timeit("boundary gathers [N,9] x2 + where", step_bounds, cs, enum_start,
       enum_cnt)

# 4. whole glue fused in one jit (what the VJP actually pays)
def glue(drows, ekr, enum_start, enum_cnt):
    rows = step_gather(drows, ekr)
    cs = jnp.cumsum(rows, axis=0)
    dseg = step_bounds(cs, enum_start, enum_cnt)
    return jnp.pad(dseg, ((0, 0), (0, blend_pallas.PARAM_ROWS - ng)))

timeit("whole glue fused", glue, drows, enum_kernel_row, enum_start, enum_cnt)

# 5. the d seed computation ([T,8,P] elementwise)
out_t = jnp.zeros((num_tiles, 8, rc.tile_size * rc.tile_size), jnp.float32)
g_t = out_t + 1.0

def dseed(out, g):
    grgb = g[:, 0:3, :]
    gt = g[:, 3:4, :]
    return (jnp.sum(out[:, 0:3, :] * grgb, axis=1, keepdims=True)
            + out[:, 3:4, :] * gt)

timeit("d seed [T,8,P]", dseed, out_t, g_t)

# 6. _window_params (fwd-side gather + pad) for reference
timeit("_window_params gather+pad", lambda p, ig: _window_params(p, ig, chunk),
       ptab, binning.inst_gauss)

# 7. pack_table (perturb means2d so the stack cannot be hoisted)
import dataclasses as _dc
timeit("pack_table [N,16]",
       lambda m2, pr: pack_table(pr._replace(means2d=m2), scene.labels),
       proj.means2d, proj)

# 8. bare bwd kernel
def bwd_kernel(params, g_cot, fwd_out):
    return blend_pallas.blend_windows_bwd(
        params, binning.win_tile, binning.win_first, binning.win_start,
        binning.win_off, binning.win_len, binning.win_rcg, g_cot,
        fwd_out, chunk=chunk,
        wpg=cfg.tiles.wpg, tile_size=rc.tile_size, tiles_x=tiles_x, num_tiles=num_tiles,
        alpha_min=rc.alpha_min, alpha_max=rc.alpha_max, interpret=False,
        early_eps=rc.early_stop_eps)

g_cot = jnp.ones((num_tiles, 8, rc.tile_size * rc.tile_size), jnp.float32)
fwd_out = jnp.ones((num_tiles, 8, rc.tile_size * rc.tile_size), jnp.float32)
timeit("bwd kernel alone", bwd_kernel, params, g_cot, fwd_out)

# 9. fwd kernel alone
def fwd_kernel(params):
    return blend_pallas.blend_windows_fwd(
        params, binning.win_tile, binning.win_first, binning.win_start,
        binning.win_off, binning.win_len, binning.win_rcg, chunk=chunk,
        wpg=cfg.tiles.wpg,
        tile_size=rc.tile_size, tiles_x=tiles_x, num_tiles=num_tiles,
        alpha_min=rc.alpha_min, alpha_max=rc.alpha_max, with_labels=False,
        interpret=False, early_eps=rc.early_stop_eps)

timeit("fwd kernel alone", fwd_kernel, params)

# 10. width-16 glue variant (sublane-aligned gathers, no pad)
def glue16(drows, ekr, enum_start, enum_cnt):
    rows = jnp.where(
        (ekr < krows)[:, None],
        drows.at[jnp.minimum(ekr, krows - 1)].get(mode="clip"), 0.0)
    cs = jnp.cumsum(rows, axis=0)
    hi = cs.at[jnp.clip(enum_start + enum_cnt - 1, 0, budget - 1)].get(
        mode="clip")
    lo = jnp.where((enum_start > 0)[:, None],
                   cs.at[jnp.maximum(enum_start - 1, 0)].get(mode="clip"),
                   0.0)
    return jnp.where((enum_cnt > 0)[:, None], hi - lo, 0.0)

timeit("whole glue fused (16-wide)", glue16, drows, enum_kernel_row,
       enum_start, enum_cnt)

cs16 = jax.jit(lambda r: jnp.cumsum(r, axis=0))(drows[:budget])
def bounds16(cs, enum_start, enum_cnt):
    hi = cs.at[jnp.clip(enum_start + enum_cnt - 1, 0, budget - 1)].get(
        mode="clip")
    lo = jnp.where((enum_start > 0)[:, None],
                   cs.at[jnp.maximum(enum_start - 1, 0)].get(mode="clip"),
                   0.0)
    return jnp.where((enum_cnt > 0)[:, None], hi - lo, 0.0)

timeit("boundary gathers [N,16] x2", bounds16, cs16, enum_start, enum_cnt)
timeit("cumsum [B,16]", lambda r: jnp.cumsum(r, axis=0), drows[:budget])
timeit("d seed [T,8,P] (repeat)", dseed, out_t, g_t)

# 11. width-16 glue with fusion barriers between stages
def glue16b(drows, ekr, enum_start, enum_cnt):
    rows = jnp.where(
        (ekr < krows)[:, None],
        drows.at[jnp.minimum(ekr, krows - 1)].get(mode="clip"), 0.0)
    rows = jax.lax.optimization_barrier(rows)
    cs = jnp.cumsum(rows, axis=0)
    cs = jax.lax.optimization_barrier(cs)
    hi = cs.at[jnp.clip(enum_start + enum_cnt - 1, 0, budget - 1)].get(
        mode="clip")
    lo = jnp.where((enum_start > 0)[:, None],
                   cs.at[jnp.maximum(enum_start - 1, 0)].get(mode="clip"),
                   0.0)
    return jnp.where((enum_cnt > 0)[:, None], hi - lo, 0.0)

timeit("glue 16-wide + barriers", glue16b, drows, enum_kernel_row,
       enum_start, enum_cnt)

# 12. width-9 glue with barriers (isolate which stage fuses badly)
def glue9b(drows, ekr, enum_start, enum_cnt):
    rows = jnp.where(
        (ekr < krows)[:, None],
        drows.at[jnp.minimum(ekr, krows - 1)].get(mode="clip")[:, :ng], 0.0)
    rows = jax.lax.optimization_barrier(rows)
    cs = jnp.cumsum(rows, axis=0)
    cs = jax.lax.optimization_barrier(cs)
    hi = cs.at[jnp.clip(enum_start + enum_cnt - 1, 0, budget - 1)].get(
        mode="clip")
    lo = jnp.where((enum_start > 0)[:, None],
                   cs.at[jnp.maximum(enum_start - 1, 0)].get(mode="clip"),
                   0.0)
    dseg = jnp.where((enum_cnt > 0)[:, None], hi - lo, 0.0)
    return jnp.pad(dseg, ((0, 0), (0, blend_pallas.PARAM_ROWS - ng)))

timeit("glue 9-wide + barriers", glue9b, drows, enum_kernel_row,
       enum_start, enum_cnt)
