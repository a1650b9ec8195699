"""Microbench of candidate ops for the round-2 binning/pack redesign.

Times XLA building blocks at bench scale (B=246k instances, N=100k
gaussians) to choose between: payload sorts vs post-sort gathers,
scatter-add vs cumsum segment reduction, sorted/unique index hints, and
fwd/bwd kernel chunk sizes.
"""
import sys
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
import gsplat_tpu.render.tiles as T
from gsplat_tpu.render import blend_pallas
from gsplat_tpu.render.api import pack_instance_params
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
proj = jax.tree_util.tree_map(
    jax.block_until_ready, project(scene, camp, W, H, cfg.raster))
cnt = int(T.count_instances(proj, tiles_x=tx, tiles_y=ty, tile_size=ts))
budget = T.bucket_budget(cnt, 64)
num_tiles = tx * ty
print(f"N={N} bbox={cnt} budget={budget}", file=sys.stderr)


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
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return dt


def pi(c):
    return (c * 1e-30).astype(jnp.int32)


def s30(x):
    return jnp.sum(x.astype(jnp.float32)) * 1e-30


# --- real data
order0 = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf),
                     stable=True).astype(jnp.int32)
tile0, g0, total0, tight0, offs0, cnt0 = T._expand_instances(
    proj.means2d[order0, 0], proj.means2d[order0, 1], proj.extent[order0],
    proj.conic[order0], proj.qmax[order0], proj.valid[order0],
    tiles_x=tx, tiles_y=ty, tile_size=ts, budget=budget, n=N)
je0 = jnp.arange(budget, dtype=jnp.int32)
key0 = (jnp.minimum(tile0, num_tiles) << 18) | je0
keys0 = jax.lax.sort(key0, is_stable=False)
ranks0 = keys0 & ((1 << 18) - 1)   # stand-in for sorted instance ranks
rows16 = jnp.ones((budget, 16), jnp.float32)
tab16 = jnp.ones((N, 16), jnp.float32)
g_rand = jax.random.randint(jax.random.PRNGKey(0), (budget,), 0, N,
                            dtype=jnp.int32)
pay = [jnp.ones((budget,), jnp.float32) * i for i in range(12)]
for a in [tile0, g0, je0, key0, keys0, ranks0, rows16, tab16, g_rand] + pay:
    jax.block_until_ready(a)


def st_gather16_sorted(c):      # params gather by enum-order g (sorted)
    g = jnp.clip(g0 + pi(c), 0, N - 1)
    return s30(tab16.at[g].get(mode="clip", indices_are_sorted=True))


def st_gather16_nohint(c):
    g = jnp.clip(g0 + pi(c), 0, N - 1)
    return s30(tab16[g])


def st_gather16_random(c):
    g = jnp.clip(g_rand + pi(c), 0, N - 1)
    return s30(tab16[g])


def st_gather16_by_rank(c):     # post-sort params gather (piecewise sorted)
    g = jnp.clip((ranks0 % N) + pi(c), 0, N - 1)
    return s30(tab16[g])


def st_sort_key_only(c):
    return s30(jax.lax.sort(key0 + pi(c), is_stable=False))


def st_sort_key_1pay(c):
    k, a = jax.lax.sort((key0 + pi(c), je0), num_keys=1)
    return s30(k) + s30(a)


def st_sort_key_4pay(c):
    out = jax.lax.sort((key0 + pi(c), *pay[:4]), num_keys=1)
    return sum(s30(o) for o in out)


def st_sort_key_12pay(c):
    out = jax.lax.sort((key0 + pi(c), *pay), num_keys=1)
    return sum(s30(o) for o in out)


def st_scatter_add_16(c):       # dptab via direct scatter-add, random order
    g = jnp.clip(g_rand + pi(c), 0, N - 1)
    return s30(jnp.zeros((N, 16), jnp.float32).at[g].add(rows16))


def st_scatter_add_16_sorted(c):  # enum order (g sorted)
    g = jnp.clip(g0 + pi(c), 0, N - 1)
    return s30(jnp.zeros((N, 16), jnp.float32).at[g].add(
        rows16, indices_are_sorted=True))


def st_cumsum_16(c):
    return s30(jnp.cumsum(rows16 + c * 1e-30, axis=0))


def st_cumsum_seg16(c):         # full current segment-sum chain (enum order)
    cs = jnp.cumsum(rows16 + c * 1e-30, axis=0)
    hi_idx = jnp.clip(offs0 + cnt0 - 1, 0, budget - 1)
    hi = cs[hi_idx]
    lo = jnp.where((offs0 > 0)[:, None], cs[jnp.maximum(offs0 - 1, 0)], 0.0)
    return s30(jnp.where((cnt0 > 0)[:, None], hi - lo, 0.0))


def st_scatter_set_sorted_hint(c):
    d = jnp.sort(g_rand) + pi(c)
    return s30(jnp.full((N,), -1, jnp.int32).at[d].set(
        je0[:budget], mode="drop", indices_are_sorted=True))


def st_marks_sorted_hint(c):
    marks = jnp.zeros((budget,), jnp.int32).at[offs0 + pi(c)].add(
        1, mode="drop", indices_are_sorted=True)
    return s30(jnp.cumsum(marks))


def st_inv_perm_scatter(c):     # rank[order] = iota scatter at N
    o = order0 + pi(c)
    return s30(jnp.zeros((N,), jnp.int32).at[o].set(
        jnp.arange(N, dtype=jnp.int32), unique_indices=True))


loop_time("gather [B,16] g enum (sorted hint)", st_gather16_sorted)
loop_time("gather [B,16] g enum (no hint)", st_gather16_nohint)
loop_time("gather [B,16] random idx", st_gather16_random)
loop_time("gather [B,16] by sorted ranks", st_gather16_by_rank)
loop_time("sort key only (B)", st_sort_key_only)
loop_time("sort key + 1 payload", st_sort_key_1pay)
loop_time("sort key + 4 payloads", st_sort_key_4pay)
loop_time("sort key + 12 payloads", st_sort_key_12pay)
loop_time("scatter-add [B,16]->[N,16] random", st_scatter_add_16)
loop_time("scatter-add [B,16]->[N,16] sorted", st_scatter_add_16_sorted)
loop_time("cumsum [B,16] f32", st_cumsum_16)
loop_time("segment-sum chain (cumsum+hi/lo)", st_cumsum_seg16)
loop_time("scatter set sorted hint (B->N)", st_scatter_set_sorted_hint)
loop_time("marks scatter sorted hint + cumsum", st_marks_sorted_hint)
loop_time("inverse-perm scatter at N", st_inv_perm_scatter)

# --- kernel chunk sweep (aligned scheme, fwd + fwd/bwd)
proj0 = proj
for chunk in (32, 64, 128, 256):
    b0 = T.bin_gaussians(proj0, tiles_x=tx, tiles_y=ty, tile_size=ts,
                         chunk=chunk,
                         budget=T.bucket_budget(cnt, chunk))
    params0 = jax.block_until_ready(
        pack_instance_params(proj0, scene.labels, b0))
    ct0, cf0, cl0 = b0.chunk_tile, b0.chunk_first, b0.chunk_live

    def st_blend(c, params, ct=ct0, cf=cf0, cl=cl0):
        out = blend_pallas.blend_chunks(
            params + c * 1e-30, ct, cf, cl, ts, tx, tx * ty,
            cfg.raster.alpha_min, cfg.raster.alpha_max, False, False,
            cfg.raster.early_stop_eps)
        return out[0, 0, 0] * 1e-30

    def st_blend_bwd(c, params, ct=ct0, cf=cf0, cl=cl0):
        def f(p):
            out = blend_pallas.blend_chunks(
                p, ct, cf, cl, ts, tx, tx * ty,
                cfg.raster.alpha_min, cfg.raster.alpha_max, False, False,
                cfg.raster.early_stop_eps)
            return jnp.sum(out[:, 0:3, :])
        return jax.grad(f)(params + c * 1e-30)[0, 0] * 1e-30

    f = loop_time(f"blend fwd chunk={chunk}", st_blend, params0)
    fb = loop_time(f"blend fwd+bwd chunk={chunk}", st_blend_bwd, params0)
    print(f"  bwd alone ~= {1e3 * (fb - f):.2f} ms "
          f"(steps={b0.num_chunks})", file=sys.stderr)
