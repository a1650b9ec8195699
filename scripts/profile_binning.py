"""Sub-stage timing of the current binning+pack pipeline (fori_loop method)."""
import sys
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.render.api import pack_instance_params
import gsplat_tpu.render.tiles as T
from gsplat_tpu.render.projection import CameraParams, project, tile_grid

W, H, N = 800, 608, 100_000
ITERS = 20
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
ts = cfg.raster.tile_size
chunk = cfg.tiles.chunk
proj = jax.tree_util.tree_map(
    jax.block_until_ready, project(scene, camp, W, H, cfg.raster))
cnt = int(T.count_instances(proj, tiles_x=tx, tiles_y=ty, tile_size=ts))
budget = T.bucket_budget(cnt, chunk)
num_tiles = tx * ty
b_pad = budget + num_tiles * chunk
print(f"N={N} bbox={cnt} budget={budget} b_pad={b_pad}", file=sys.stderr)


def loop_time(name, stage, *args):
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: stage(c, *a), 0.0)
    float(run(1, *args))
    def timed(n):
        t0 = time.time(); float(run(n, *args)); return time.time() - t0
    dt_n = min(timed(ITERS + 1), timed(ITERS + 1))
    dt_1 = min(timed(1), timed(1))
    dt = max((dt_n - dt_1) / ITERS, 1e-6)
    print(f"{name:30s} {dt*1e3:8.2f} ms")


order0 = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf),
                     stable=True).astype(jnp.int32)


def st_argsort(c):
    key = jnp.where(proj.valid, proj.depth + c * 1e-30, jnp.inf)
    return jnp.argsort(key, stable=True)[0].astype(jnp.float32) * 1e-30


def sorted_inputs(c):
    return (proj.means2d[order0, 0] + c * 1e-30, proj.means2d[order0, 1],
            proj.extent[order0], proj.conic[order0], proj.qmax[order0],
            proj.valid[order0])


def st_sorted_gather(c):
    u, v, e, co, q, va = sorted_inputs(c)
    return u[0] * 1e-30 + e[0, 0] * 1e-30 + co[0, 0] * 1e-30


def st_expand(c):
    u, v, e, co, q, va = sorted_inputs(c)
    tile, g, total, tight = T._expand_instances(
        u, v, e, co, q, va, tiles_x=tx, tiles_y=ty, tile_size=ts,
        budget=budget, n=N)[:4]
    return (tile[0] + g[0]).astype(jnp.float32) * 1e-30


u0, v0, e0, co0, q0, va0 = jax.tree_util.tree_map(
    jax.block_until_ready, sorted_inputs(0.0))
tile0, g0 = jax.tree_util.tree_map(jax.block_until_ready, tuple(
    T._expand_instances(u0, v0, e0, co0, q0, va0, tiles_x=tx, tiles_y=ty,
                        tile_size=ts, budget=budget, n=N)[:2]))


def st_sort(c, t, g):
    it, ig = jax.lax.sort((t + (c * 1e-30).astype(jnp.int32), g),
                          num_keys=1, is_stable=True)
    return (it[0] + ig[0]).astype(jnp.float32) * 1e-30


inst_tile0, inst_g0 = jax.tree_util.tree_map(jax.block_until_ready, tuple(
    jax.lax.sort((tile0, g0), num_keys=1, is_stable=True)))


def st_tail(c, it, ig):
    it = it + (c * 1e-30).astype(jnp.int32)
    tile_start = jnp.searchsorted(
        it, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    n_t = jnp.diff(tile_start)
    tile_start = tile_start[:num_tiles]
    csum = jnp.cumsum(n_t)
    n_t2 = jnp.clip(budget - (csum - n_t), 0, n_t)
    pad_cnt = jnp.maximum(-(-n_t2 // chunk) * chunk, chunk)
    pad_off = jnp.cumsum(pad_cnt) - pad_cnt
    num_chunks = b_pad // chunk
    cmarks = jnp.zeros((num_chunks,), jnp.int32).at[pad_off // chunk].add(
        1, mode="drop")
    chunk_tile = jnp.clip(jnp.cumsum(cmarks) - 1, 0, num_tiles - 1)
    j = jnp.arange(budget, dtype=jnp.int32)
    is_real = it < num_tiles
    span = budget + b_pad + 1
    ramp_k = 1 << max(span - 1, 1).bit_length()

    def spread(vals):
        enc = vals + ramp_k * jnp.arange(1, num_tiles + 1, dtype=jnp.int32)
        seed = jnp.full((budget,), jnp.int32(-2 ** 31), jnp.int32)
        seed = seed.at[tile_start].max(enc, mode="drop")
        return jax.lax.cummax(seed) - ramp_k * (it + 1)

    delta = spread(pad_off - tile_start)
    cap = spread(pad_off + n_t2)
    dst = j + delta
    dst = jnp.where(is_real & (dst < cap), dst, b_pad)
    inst_gauss = jnp.full((b_pad,), -1, dtype=jnp.int32)
    inst_gauss = inst_gauss.at[dst].set(ig, mode="drop")
    return (inst_gauss[0] + chunk_tile[0]).astype(jnp.float32) * 1e-30


from gsplat_tpu.render.tiles import bin_gaussians
b0 = jax.tree_util.tree_map(jax.block_until_ready, bin_gaussians(
    proj, tiles_x=tx, tiles_y=ty, tile_size=ts, chunk=chunk, budget=budget))


def st_pack(c, b):
    p2 = proj._replace(means2d=proj.means2d + c * 1e-30)
    params = pack_instance_params(p2, scene.labels, b)
    return params[0, 0] * 1e-30


def st_pack_grad(c, b):
    def f(m2):
        params = pack_instance_params(
            proj._replace(means2d=m2), scene.labels, b)
        return jnp.sum(params)
    g = jax.grad(f)(proj.means2d + c * 1e-30)
    return g[0, 0] * 1e-30


loop_time("argsort depth (N)", st_argsort)
loop_time("sorted gathers (N rows)", st_sorted_gather)
loop_time("gathers+expand+filter (B)", st_expand)
loop_time("lax.sort (B)", st_sort, tile0, g0)
loop_time("tail: spread+scatter", st_tail, inst_tile0, inst_g0)
loop_time("pack fwd", st_pack, b0)
loop_time("pack fwd+bwd", st_pack_grad, b0)
