"""Bisect XLA compile time of the render pipeline's components.

Times .lower().compile() for each stage separately on the bench scene
shapes so the dominant compile cost is attributable (VERDICT r1 weak #2:
61.9s -> target <20s).
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
from gsplat_tpu.render import blend_pallas
from gsplat_tpu.render.api import (_render_impl, _window_params,
                                   blend_scene_windows, measure_budgets,
                                   pack_table)
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import bin_windows

W, H, N = 800, 608, 100_000
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
bg = jnp.zeros(3, jnp.float32)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
interpret = jax.default_backend() not in ("tpu", "axon")
budget, kb, nw = measure_budgets(scene, cam, cfg)
print(f"budget={budget} kb={kb} nw={nw}", file=sys.stderr)


def ctime(name, fn, *args):
    t0 = time.time()
    jax.jit(fn).lower(*args).compile()
    print(f"{name:34s} {time.time()-t0:7.1f} s")


def f_project(s):
    return project(s, camp, W, H, cfg.raster)


def f_bin(s):
    p = project(s, camp, W, H, cfg.raster)
    return bin_windows(p, tiles_x=tx, tiles_y=ty,
                       tile_size=cfg.raster.tile_size, chunk=cfg.tiles.chunk,
                       budget=budget, kernel_budget=kb, num_windows=nw)


proj0 = project(scene, camp, W, H, cfg.raster)
b0 = bin_windows(proj0, tiles_x=tx, tiles_y=ty,
                 tile_size=cfg.raster.tile_size, chunk=cfg.tiles.chunk,
                 budget=budget, kernel_budget=kb, num_windows=nw)
ptab0 = pack_table(proj0, scene.labels)


def f_blend_fwd(ptab):
    return blend_scene_windows(
        ptab, b0.inst_gauss, b0.win_tile, b0.win_first, b0.win_start,
        b0.win_off, b0.win_len, b0.win_rcg, b0.enum_kernel_row,
        b0.enum_start, b0.enum_cnt,
        cfg.tiles.chunk, cfg.tiles.wpg, cfg.raster.tile_size, tx, tx * ty,
        cfg.raster.alpha_min, cfg.raster.alpha_max, False, interpret,
        cfg.raster.early_stop_eps)


def f_blend_bwd(ptab):
    return jax.grad(lambda p: jnp.sum(f_blend_fwd(p)[:, 0:3, :]))(ptab)


def f_fwd(s):
    return _render_impl(s, camp, bg, width=W, height=H, cfg=cfg,
                        with_labels=False, impl="pallas",
                        interpret=interpret, budget=budget,
                        kernel_budget=kb, num_windows=nw)["image"]


target = jnp.zeros((H, W, 3), jnp.float32)


def f_fwdbwd(s):
    def loss_fn(params: SceneParams):
        img = _render_impl(params.to_scene(s.labels), camp, bg, width=W,
                           height=H, cfg=cfg, with_labels=False,
                           impl="pallas", interpret=interpret, budget=budget,
                           kernel_budget=kb, num_windows=nw)["image"]
        return 0.5 * jnp.sum((img - target) ** 2)
    return jax.value_and_grad(loss_fn)(SceneParams.from_scene(s))


def f_fori(s):
    def one(c):
        _, grads = f_fwdbwd(s)
        return grads.means[0, 0] * 1e-30 + c * 0.0
    return jax.lax.fori_loop(0, 3, lambda i, c: one(c), 0.0)


ctime("project", f_project, scene)
ctime("project+bin", f_bin, scene)
ctime("blend fwd op", f_blend_fwd, ptab0)
ctime("blend fwd+bwd op", f_blend_bwd, ptab0)
ctime("full render fwd", f_fwd, scene)
ctime("full fwd+bwd (grad)", f_fwdbwd, scene)
ctime("fori_loop(fwd+bwd)", f_fori, scene)
