"""Stage-by-stage timing of the render pipeline on the bench scene.

Each stage runs inside one jitted ``lax.fori_loop`` with a genuine data
dependency (bench.py methodology) so remote-tunnel dispatch overhead is
amortized and XLA cannot hoist the work. Prints ms/iter per stage.
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
from gsplat_tpu.models.trainer import SceneParams
from gsplat_tpu.render.api import (_render_impl, _window_params,
                                   blend_scene_windows, pack_table)
from gsplat_tpu.render import blend_pallas
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import bin_windows, bucket_budget, count_instances

W, H, N = 800, 608, 100_000
ITERS = 20
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
bg = jnp.zeros(3, jnp.float32)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
proj0 = project(scene, camp, W, H, cfg.raster)
cnt = int(count_instances(proj0, tiles_x=tx, tiles_y=ty,
                          tile_size=cfg.raster.tile_size))
budget = bucket_budget(cnt, cfg.tiles.chunk)
print(f"instances={cnt} budget={budget} tiles={tx}x{ty}", file=sys.stderr)

interpret = jax.default_backend() not in ("tpu", "axon")


def loop_time(name, stage, *args):
    """stage(c, *args) -> scalar float; runs ITERS times inside fori_loop."""
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: stage(c, *a), 0.0)

    float(run(1, *args))
    def timed(n):
        t0 = time.time()
        float(run(n, *args))
        return time.time() - t0
    dt_n = min(timed(ITERS + 1), timed(ITERS + 1))
    dt_1 = min(timed(1), timed(1))
    dt = max((dt_n - dt_1) / ITERS, 1e-6)
    print(f"{name:26s} {dt*1e3:8.2f} ms")
    return dt


def ptb(s, c):
    import dataclasses
    return dataclasses.replace(s, means=s.means + c * 1e-30)


def st_project(c, s):
    p = project(ptb(s, c), camp, W, H, cfg.raster)
    return p.u[0] * 1e-30


def st_bin(c, s):
    p = project(ptb(s, c), camp, W, H, cfg.raster)
    b = bin_windows(p, tiles_x=tx, tiles_y=ty,
                    tile_size=cfg.raster.tile_size, chunk=cfg.tiles.chunk,
                    budget=budget)
    return b.inst_gauss[0].astype(jnp.float32) * 1e-30


def st_pack(c, s):
    p = project(ptb(s, c), camp, W, H, cfg.raster)
    b = bin_windows(p, tiles_x=tx, tiles_y=ty,
                    tile_size=cfg.raster.tile_size, chunk=cfg.tiles.chunk,
                    budget=budget)
    ptab = pack_table(p, s.labels)
    params = _window_params(ptab, b.inst_gauss, cfg.tiles.chunk)
    return params[0, 0] * 1e-30


def st_fwd(c, s):
    out = _render_impl(ptb(s, c), camp, bg, width=W, height=H, cfg=cfg,
                       with_labels=False, impl="pallas", interpret=interpret,
                       budget=budget)
    return out["image"][0, 0, 0] * 1e-30


target = jnp.zeros((H, W, 3), jnp.float32)


def st_fwdbwd(c, s):
    def loss_fn(params: SceneParams):
        out = _render_impl(params.to_scene(s.labels), camp, bg, width=W,
                           height=H, cfg=cfg, with_labels=False,
                           impl="pallas", interpret=interpret, budget=budget)
        return 0.5 * jnp.sum((out["image"] - target) ** 2)
    loss, grads = jax.value_and_grad(loss_fn)(SceneParams.from_scene(ptb(s, c)))
    return grads.means[0, 0] * 1e-30 + loss * 1e-30


# blend alone on a fixed rank table (binning outside the loop)
b0 = bin_windows(proj0, tiles_x=tx, tiles_y=ty,
                 tile_size=cfg.raster.tile_size, chunk=cfg.tiles.chunk,
                 budget=budget)
ptab0 = jax.block_until_ready(pack_table(proj0, scene.labels))
wt0, wf0, ws0, wo0, wl0, wr0 = (b0.win_tile, b0.win_first, b0.win_start,
                                b0.win_off, b0.win_len, b0.win_rcg)
ig0 = b0.inst_gauss
ekr0, es0, ec0 = b0.enum_kernel_row, b0.enum_start, b0.enum_cnt


def st_blend(c, ptab):
    out = blend_scene_windows(
        ptab + c * 1e-30, ig0, wt0, wf0, ws0, wo0, wl0, wr0, ekr0, es0,
        ec0,
        cfg.tiles.chunk, cfg.tiles.wpg, cfg.raster.tile_size, tx, tx * ty,
        cfg.raster.alpha_min, cfg.raster.alpha_max, False, interpret,
        cfg.raster.early_stop_eps)
    return out[0, 0, 0] * 1e-30


def st_blend_bwd(c, ptab):
    def f(p):
        out = blend_scene_windows(
            p, ig0, wt0, wf0, ws0, wo0, wl0, wr0, ekr0, es0, ec0,
            cfg.tiles.chunk, cfg.tiles.wpg, cfg.raster.tile_size, tx, tx * ty,
            cfg.raster.alpha_min, cfg.raster.alpha_max, False, interpret,
            cfg.raster.early_stop_eps)
        return jnp.sum(out[:, 0:3, :])
    g = jax.grad(f)(ptab + c * 1e-30)
    return g[0, 0] * 1e-30


loop_time("project", st_project, scene)
loop_time("project+bin", st_bin, scene)
loop_time("project+bin+pack", st_pack, scene)
loop_time("blend fwd (op incl gather)", st_blend, ptab0)
loop_time("blend fwd+bwd (op+scatter)", st_blend_bwd, ptab0)
loop_time("full fwd", st_fwd, scene)
loop_time("full fwd+bwd", st_fwdbwd, scene)
