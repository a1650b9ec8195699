"""Decompose bin_windows' runtime into its constituent ops on the bench
scene (r3): sort vs gathers vs scatters vs cummax spreads vs elementwise."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
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
ITERS = 30
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02),
                     num_labels=16)
camp = CameraParams.from_camera(cam)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
proj0 = project(scene, camp, W, H, cfg.raster)
cnt = int(count_instances(proj0, tiles_x=tx, tiles_y=ty,
                          tile_size=cfg.raster.tile_size))
B = bucket_budget(cnt, cfg.tiles.chunk)
num_tiles = tx * ty
print(f"B={B} tiles={num_tiles}", file=sys.stderr)

key0 = jax.random.PRNGKey(0)
keys = jax.random.randint(key0, (B,), 0, 2**30, jnp.int32)
g = jax.random.randint(key0, (B,), 0, N, jnp.int32)
j = jnp.arange(B, dtype=jnp.int32)
etab = jax.random.normal(key0, (N, 16), jnp.float32)
rows16 = jax.random.normal(key0, (B, 16), jnp.float32)
vals = jax.random.randint(key0, (B,), 0, B, jnp.int32)


def timeit(name, fn, *args):
    @jax.jit
    def run(n, *a):
        return jax.lax.fori_loop(0, n, lambda i, c: fn(c, *a), 0.0)
    float(run(1, *args))
    import statistics
    def t(n):
        t0 = time.time()
        float(run(n, *args))
        return time.time() - t0
    hi, lo = ITERS + 1, max(ITERS // 4, 1)
    dt = max((statistics.median(t(hi) for _ in range(5))
              - statistics.median(t(lo) for _ in range(5))) / (hi - lo), 1e-9)
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


def f(x):
    return x.reshape(-1)[0].astype(jnp.float32) * 1e-30


timeit("sort1 stable (key,j)", lambda c, k, jj: f(
    jax.lax.sort((jnp.bitwise_xor(k, c.astype(jnp.int32)), jj),
                 num_keys=1, is_stable=True)[1]), keys, j)
timeit("sort1 stable (key,g,j)", lambda c, k, gg, jj: f(
    jax.lax.sort((jnp.bitwise_xor(k, c.astype(jnp.int32)), gg, jj),
                 num_keys=1, is_stable=True)[1]), keys, g, j)
timeit("sort1 UNstable (key,g,j)", lambda c, k, gg, jj: f(
    jax.lax.sort((jnp.bitwise_xor(k, c.astype(jnp.int32)), gg, jj),
                 num_keys=1, is_stable=False)[1]), keys, g, j)
timeit("gather [B,16] (rand idx)", lambda c, e, gg: f(
    e.at[gg + c.astype(jnp.int32)].get(mode="clip")), etab, g)
timeit("gather [B,16] sorted idx", lambda c, e, gg: f(
    e.at[gg + c.astype(jnp.int32)].get(mode="clip",
                                       indices_are_sorted=True)),
    etab, jnp.sort(g))
timeit("scatter [B] i32", lambda c, v, jj: f(
    jnp.full((B,), 0, jnp.int32).at[v].set(
        jj + c.astype(jnp.int32), mode="drop", unique_indices=True)),
    vals, j)
timeit("cummax [B] i32", lambda c, v: f(
    jax.lax.cummax(v + c.astype(jnp.int32))), vals)
timeit("cumsum [B,9] f32", lambda c, r: f(
    jnp.cumsum(r[:, :9] + c * 1e-30, axis=0)), rows16)
timeit("cumsum [B,16] f32", lambda c, r: f(
    jnp.cumsum(r + c * 1e-30, axis=0)), rows16)
timeit("cumsum [B] i32 (marks)", lambda c, v: f(
    jnp.cumsum(v + c.astype(jnp.int32))), vals)

timeit("scatter-ADD [B,16]->N", lambda c, r, gg: f(
    jnp.zeros((N, 16), jnp.float32).at[gg].add(r + c * 1e-30, mode="drop")),
    rows16, g)
timeit("scatter-ADD [B,9]->N", lambda c, r, gg: f(
    jnp.zeros((N, 9), jnp.float32).at[gg].add(r[:, :9] + c * 1e-30,
                                              mode="drop")), rows16, g)
timeit("gather [B] i32", lambda c, v, gg: f(
    v.at[gg + c.astype(jnp.int32)].get(mode="clip")), vals, g)

# --- remaining bin_windows ops not yet attributed (r3.2) ---
offs = jnp.sort(jax.random.randint(key0, (N,), 0, B, jnp.int32))
timeit("marks scatter-add N->[B]", lambda c, o: f(
    jnp.zeros((B,), jnp.int32).at[o].add(
        1 + c.astype(jnp.int32) * 0, mode="drop", indices_are_sorted=True)),
    offs)
timeit("marks scatter-add (unsorted flag)", lambda c, o: f(
    jnp.zeros((B,), jnp.int32).at[o].add(
        1 + c.astype(jnp.int32) * 0, mode="drop")), offs)
bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * (2**30 // num_tiles)
skeys = jnp.sort(keys)
timeit("searchsorted [B] x 476 bounds", lambda c, k, bb: f(
    jnp.searchsorted(k, bb + c.astype(jnp.int32) * 0)), skeys, bounds)
# full elementwise block of the enumeration (~30 ops on [B])
def enum_elemwise(c, e):
    local = (j - e[:, 0].astype(jnp.int32)).astype(jnp.float32) + c * 1e-30
    bw_g = e[:, 1]
    row = jnp.floor((local + 0.5) / bw_g)
    col = (local - row * bw_g).astype(jnp.int32)
    tcol = e[:, 2].astype(jnp.int32) + col
    trow = e[:, 3].astype(jnp.int32) + row.astype(jnp.int32)
    tile = trow * 25 + tcol
    return f(tile)
timeit("enum elementwise [B]", enum_elemwise, rows16)
