"""Micro-timing of individual binning ops at bench scale (B=246k).

Every stage's return value sums over its full outputs so DCE can't trim the
work, and all inputs are perturbed by the loop carry so loop-invariant
hoisting can't lift the op out of the fori_loop.
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
    print(f"{name:34s} {dt*1e3:8.3f} ms")


def pi(c):  # int perturbation (always 0, but data-dependent)
    return (c * 1e-30).astype(jnp.int32)


def s30(x):  # full-output dependency
    return jnp.sum(x.astype(jnp.float32)) * 1e-30


# --- materialize real intermediate data once
order0 = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf),
                     stable=True).astype(jnp.int32)
u0 = proj.means2d[order0, 0]
v0 = proj.means2d[order0, 1]
e0 = proj.extent[order0]
co0 = proj.conic[order0]
q0 = proj.qmax[order0]
va0 = proj.valid[order0]
x0_, y0_, bw_, cnt_ = T._tile_bbox(u0, v0, e0[:, 0], e0[:, 1], va0,
                                   float(ts), tx, ty)
offsets0 = jnp.cumsum(cnt_) - cnt_
gtab0 = jnp.stack([
    offsets0.astype(jnp.float32), jnp.maximum(bw_, 1).astype(jnp.float32),
    x0_.astype(jnp.float32), y0_.astype(jnp.float32),
    u0, v0, co0[:, 0], co0[:, 1], co0[:, 2], q0], axis=1)
tile0, g0, total0, tight0, _, _ = T._expand_instances(
    u0, v0, e0, co0, q0, va0, tiles_x=tx, tiles_y=ty, tile_size=ts,
    budget=budget, n=N)
je0 = jnp.arange(budget, dtype=jnp.int32)
stuff = [order0, u0, gtab0, tile0, g0, offsets0, cnt_]
for a in stuff:
    jax.block_until_ready(a)

dst0 = jnp.where(tile0 < num_tiles, je0 % b_pad, b_pad)


def st_argsort(c):
    key = jnp.where(proj.valid, proj.depth + c * 1e-30, jnp.inf)
    return s30(jnp.argsort(key, stable=True))


def st_gather_n(c):  # the 6 order-indexed gathers at N rows
    o = order0 + pi(c)
    return (s30(proj.means2d[o]) + s30(proj.extent[o]) + s30(proj.conic[o])
            + s30(proj.qmax[o]) + s30(proj.valid[o]))


def st_marks_cumsum(c):
    marks = jnp.zeros((budget,), jnp.int32).at[offsets0 + pi(c)].add(
        1, mode="drop")
    return s30(jnp.cumsum(marks))


def st_gather_b10(c):
    g = jnp.clip(g0 + pi(c), 0, N - 1)
    return s30(gtab0[g])


def st_gather_b1(c):
    g = jnp.clip(g0 + pi(c), 0, N - 1)
    return s30(gtab0[g, 0])


def st_rowcol(c):
    grow = gtab0[jnp.clip(g0 + pi(c), 0, N - 1)]
    j = je0
    local = j - grow[:, 0].astype(jnp.int32)
    bw_g = grow[:, 1]
    row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
    col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
    row = row.astype(jnp.int32)
    tcol = grow[:, 2].astype(jnp.int32) + col
    trow = grow[:, 3].astype(jnp.int32) + row
    return s30(trow * tx + tcol)


def st_rect_min_q(c):
    grow = gtab0[jnp.clip(g0 + pi(c), 0, N - 1)]
    mq = T._rect_min_q(grow[:, 4], grow[:, 5], grow[:, 6], grow[:, 7],
                       grow[:, 8], grow[:, 2] * ts, grow[:, 3] * ts,
                       float(ts))
    return s30(mq)


def st_sort3(c):
    t = tile0 + pi(c)
    it, ig, ij = jax.lax.sort((t, g0, je0), num_keys=1, is_stable=True)
    return s30(it) + s30(ig) + s30(ij)


def st_sort_packed(c):
    # single packed key: tile(10 bits) << 18 | je(18 bits); je ascending =>
    # equivalent to stable-by-tile. unpack after.
    key = ((tile0 + pi(c)) << 18) | je0
    ks = jax.lax.sort(key, is_stable=False)
    it = ks >> 18
    ij = ks & ((1 << 18) - 1)
    return s30(it) + s30(ij)


def st_sort_packed_g(c):
    key = ((tile0 + pi(c)) << 18) | je0
    ks = jax.lax.sort(key, is_stable=False)
    ij = ks & ((1 << 18) - 1)
    ig = jnp.clip(jnp.cumsum(jnp.zeros((budget,), jnp.int32).at[
        offsets0].add(1, mode="drop")) - 1, 0, N - 1)[ij]
    return s30(ks >> 18) + s30(ig) + s30(ij)


def st_cumsum_b(c):
    return s30(jnp.cumsum(tile0 + pi(c)))


def st_cummax_b(c):
    return s30(jax.lax.cummax(tile0 + pi(c)))


def st_searchsorted(c):
    it = tile0 + pi(c)
    return s30(jnp.searchsorted(
        it, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"))


def st_scatter_set(c):
    d = dst0 + pi(c)
    out = jnp.full((b_pad,), -1, jnp.int32).at[d].set(g0, mode="drop")
    return s30(out)


def st_scatter_set2(c):  # inst_dst scatter
    d = dst0 + pi(c)
    out = jnp.full((budget,), b_pad, jnp.int32).at[je0].set(d, mode="drop")
    return s30(out)


loop_time("argsort depth (N)", st_argsort)
loop_time("order gathers (N rows x5)", st_gather_n)
loop_time("marks scatter+cumsum (B)", st_marks_cumsum)
loop_time("gather gtab[g] [B,10]", st_gather_b10)
loop_time("gather gtab[g,0] [B]", st_gather_b1)
loop_time("rowcol arithmetic (B)", st_rowcol)
loop_time("rect_min_q (B)", st_rect_min_q)
loop_time("lax.sort 3-array (B)", st_sort3)
loop_time("lax.sort packed 1-key (B)", st_sort_packed)
loop_time("packed sort + g reconstruct", st_sort_packed_g)
loop_time("cumsum i32 (B)", st_cumsum_b)
loop_time("cummax i32 (B)", st_cummax_b)
loop_time("searchsorted (476 in B)", st_searchsorted)
loop_time("scatter set B->b_pad", st_scatter_set)
loop_time("scatter set B->B", st_scatter_set2)
