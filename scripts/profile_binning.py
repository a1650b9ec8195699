"""Sub-stage timing of bin_gaussians: argsort(N), expansion, lax.sort(B),
searchsorted, scatter. Same fori_loop methodology as profile_stages."""
import sys
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import bucket_budget, count_instances

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
cnt = int(count_instances(proj, tiles_x=tx, tiles_y=ty, tile_size=ts))
budget = bucket_budget(cnt, chunk)
num_tiles = tx * ty
b_pad = budget + num_tiles * chunk
print(f"N={N} instances={cnt} budget={budget} b_pad={b_pad}", file=sys.stderr)


def loop_time(name, stage, *args):
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
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return dt


depth = proj.depth
valid = proj.valid
u, v, r = proj.means2d[:, 0], proj.means2d[:, 1], proj.radius


def st_argsort(c, d):
    key = jnp.where(valid, d + c * 1e-30, jnp.inf)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    return order[0].astype(jnp.float32) * 1e-30


order0 = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True).astype(jnp.int32)


def expand(c):
    us = u[order0] + c * 1e-30
    vs = v[order0]
    rs = r[order0]
    valid_s = valid[order0]
    x0 = jnp.clip(jnp.floor((us - rs) / ts).astype(jnp.int32), 0, tx)
    x1 = jnp.clip(jnp.ceil((us + rs) / ts).astype(jnp.int32), 0, tx)
    y0 = jnp.clip(jnp.floor((vs - rs) / ts).astype(jnp.int32), 0, ty)
    y1 = jnp.clip(jnp.ceil((vs + rs) / ts).astype(jnp.int32), 0, ty)
    bw = jnp.maximum(x1 - x0, 0)
    bh = jnp.maximum(y1 - y0, 0)
    cntv = jnp.where(valid_s, bw * bh, 0).astype(jnp.int32)
    offsets = jnp.cumsum(cntv) - cntv
    total = offsets[-1] + cntv[-1]
    j = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(marks) - 1, 0, N - 1)
    inside = j < total
    gtab = jnp.stack([offsets, jnp.maximum(bw, 1), x0, y0], axis=1)
    grow = gtab[g]
    local = j - grow[:, 0]
    bw_g = grow[:, 1]
    row = jnp.floor((local.astype(jnp.float32) + 0.5)
                    / bw_g.astype(jnp.float32)).astype(jnp.int32)
    col = local - row * bw_g
    tile = (grow[:, 3] + row) * tx + (grow[:, 2] + col)
    tile = jnp.where(inside, tile, num_tiles)
    return tile, g


def st_expand(c):
    tile, g = expand(c)
    return tile[0].astype(jnp.float32) * 1e-30


tile0, g0 = expand(0.0)
tile0 = jax.block_until_ready(tile0)


def st_sort2(c, t, g):
    it, ig = jax.lax.sort((t + (c * 1e-30).astype(jnp.int32), g),
                          num_keys=1, is_stable=True)
    return it[0].astype(jnp.float32) * 1e-30


def st_sort1(c, t, g):
    nbits = 18  # 2^18 = 262144 >= budget
    key = (t << nbits) | jnp.arange(budget, dtype=jnp.int32)
    key = key + (c * 1e-30).astype(jnp.int32)
    sk = jax.lax.sort(key, is_stable=False)
    j = sk & ((1 << nbits) - 1)
    it = sk >> nbits
    ig = g[j]
    return it[0].astype(jnp.float32) * 1e-30 + ig[0].astype(jnp.float32) * 1e-30


inst_tile0, inst_g0 = jax.lax.sort((tile0, g0), num_keys=1, is_stable=True)
inst_tile0 = jax.block_until_ready(inst_tile0)


def st_tail(c, inst_tile, inst_g):
    it = inst_tile + (c * 1e-30).astype(jnp.int32)
    tile_start = jnp.searchsorted(
        it, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    n_t = jnp.diff(tile_start)
    tile_start = tile_start[:num_tiles]
    pad_cnt = jnp.maximum(-(-n_t // chunk) * chunk, chunk)
    pad_off = jnp.cumsum(pad_cnt) - pad_cnt
    num_chunks = b_pad // chunk
    cmarks = jnp.zeros((num_chunks,), jnp.int32).at[pad_off // chunk].add(
        1, mode="drop")
    chunk_tile = jnp.clip(jnp.cumsum(cmarks) - 1, 0, num_tiles - 1)
    j = jnp.arange(budget, dtype=jnp.int32)
    is_real = it < num_tiles
    t_c = jnp.minimum(it, num_tiles - 1)
    ttab = jnp.stack([pad_off, tile_start], axis=1)
    trow = ttab[t_c]
    dst = jnp.where(is_real, trow[:, 0] + (j - trow[:, 1]), b_pad)
    inst_gauss = jnp.full((b_pad,), -1, dtype=jnp.int32)
    inst_gauss = inst_gauss.at[dst].set(inst_g, mode="drop")
    return inst_gauss[0].astype(jnp.float32) * 1e-30


loop_time("argsort depth (N)", st_argsort, depth)
loop_time("expand to instances (B)", st_expand)
loop_time("lax.sort 2-arr (B)", st_sort2, tile0, g0)
loop_time("lax.sort fused 1-key (B)", st_sort1, tile0, g0)
loop_time("tail: ranges+scatter", st_tail, inst_tile0, g0)
