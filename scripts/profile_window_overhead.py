"""Isolate the window kernels' per-grid-step overhead.

Times the forward/backward window kernels on the bench scene three ways:
  - live: the real binning (mix of live and padding windows)
  - dead: same grid, every win_len forced to 0 (pure per-step cost)
  - live windows only: k_static cut to the real window count
Prints ms and us/step so kernel work vs fixed overhead separate.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.render import blend_pallas
from gsplat_tpu.render.api import _window_params, pack_table
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import (bin_windows, bucket_budget,
                                     count_instances, count_instances_tight)

W, H, N = 800, 608, 100_000
ITERS = 30
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 64
WPG = int(sys.argv[2]) if len(sys.argv) > 2 else 1
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
ts = cfg.raster.tile_size
proj0 = project(scene, camp, W, H, cfg.raster)
cnt = int(count_instances(proj0, tiles_x=tx, tiles_y=ty, tile_size=ts))
budget = bucket_budget(cnt, CHUNK)
tight = int(count_instances_tight(proj0, tiles_x=tx, tiles_y=ty,
                                  tile_size=ts, budget=budget))
kb = bucket_budget(tight, CHUNK)
b = bin_windows(proj0, tiles_x=tx, tiles_y=ty, tile_size=ts, chunk=CHUNK,
                budget=budget, kernel_budget=kb, wpg=WPG)
ptab = jax.block_until_ready(pack_table(proj0, scene.labels))
params = jax.block_until_ready(_window_params(ptab, b.inst_gauss, CHUNK,
                                              WPG))
k_static = b.win_tile.shape[0]
import numpy as np
nlive = int(np.sum(np.asarray(b.win_len) > 0))
print(f"chunk={CHUNK} tight={tight} kb={kb} k_static={k_static} "
      f"live={nlive}", file=sys.stderr)

interpret = jax.default_backend() not in ("tpu", "axon")
p = ts * ts
num_tiles = tx * ty


def timeit(name, fn, *args):
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c, *a), 0.0)
    float(run(1, *args))
    def t(n):
        t0 = time.time()
        float(run(n, *args))
        return time.time() - t0
    dt = max((min(t(ITERS + 1) for _ in range(2))
              - min(t(1) for _ in range(2))) / ITERS, 1e-9)
    steps = args[-1].shape[0] if hasattr(args[-1], "shape") else k_static
    print(f"{name:24s} {dt*1e3:8.2f} ms   {dt*1e6/k_static:6.2f} us/step")
    return dt


def fwd(c, prm, wt, wf, ws, wo, wl):
    out = blend_pallas.blend_windows_fwd(
        prm + c * 1e-30, wt, wf, ws, wo, wl, b.win_rcg, chunk=CHUNK, wpg=WPG,
        tile_size=ts,
        tiles_x=tx, num_tiles=num_tiles, alpha_min=cfg.raster.alpha_min,
        alpha_max=cfg.raster.alpha_max, with_labels=False,
        interpret=interpret, early_eps=cfg.raster.early_stop_eps)
    return out[0, 0, 0] * 1e-30


g_cot = jnp.ones((num_tiles, 8, p), jnp.float32)
fwd_out = jnp.ones((num_tiles, 8, p), jnp.float32)


def bwd(c, prm, wt, wf, ws, wo, wl):
    out = blend_pallas.blend_windows_bwd(
        prm + c * 1e-30, wt, wf, ws, wo, wl, b.win_rcg, g_cot, fwd_out,
        chunk=CHUNK,
        wpg=WPG, tile_size=ts,
        tiles_x=tx, num_tiles=num_tiles, alpha_min=cfg.raster.alpha_min,
        alpha_max=cfg.raster.alpha_max, interpret=interpret,
        early_eps=cfg.raster.early_stop_eps)
    return out[0, 0] * 1e-30


wt, wf, ws, wo, wl = (b.win_tile, b.win_first, b.win_start, b.win_off,
                      b.win_len)
timeit("fwd live", fwd, params, wt, wf, ws, wo, wl)
timeit("fwd all-dead", fwd, params, wt, wf, ws, wo, jnp.zeros_like(wl))
timeit("bwd live", bwd, params, wt, wf, ws, wo, wl)
timeit("bwd all-dead", bwd, params, wt, wf, ws, wo, jnp.zeros_like(wl))
