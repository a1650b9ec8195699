"""In-process A/B: honest projection cost (ALL outputs consumed — the
stage profiler's single-element probe lets XLA DCE the whole pass) and the
blend-VJP glue parts, on the bench scene. Candidates for Pallas fusion.
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
from gsplat_tpu.render.projection import CameraParams, project, tile_grid
from gsplat_tpu.render.tiles import bin_windows, bucket_budget, count_instances

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
print(f"B={B}", file=sys.stderr)


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
    pairs = []
    for _ in range(5):
        a, b = t(hi), t(lo)
        if a > b:
            pairs.append((a - b) / (hi - lo))
    dt = statistics.median(pairs) if pairs else float("nan")
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


def ptb(s, c):
    import dataclasses
    return dataclasses.replace(s, means=s.means + c * 1e-30)


def consume_proj(p):
    return (jnp.sum(p.u) + jnp.sum(p.v) + jnp.sum(p.ca) + jnp.sum(p.cb)
            + jnp.sum(p.cc) + jnp.sum(p.depth)
            + jnp.sum(p.radius) + jnp.sum(p.ex) + jnp.sum(p.ey)
            + jnp.sum(p.qmax) + jnp.sum(p.red) + jnp.sum(p.green)
            + jnp.sum(p.blue) + jnp.sum(p.opacity)
            + jnp.sum(p.valid.astype(jnp.float32))) * 1e-30


def st_project_full(c, s):
    return consume_proj(project(ptb(s, c), camp, W, H, cfg.raster))


timeit("project (ALL outputs)", st_project_full, scene)

# --- VJP glue parts at bench shapes
key0 = jax.random.PRNGKey(0)
KC = B  # kernel rows ~ budget
drows = jax.random.normal(key0, (KC, 16), jnp.float32)
ekr = jax.random.randint(key0, (B,), 0, KC, jnp.int32)
estart = jnp.sort(jax.random.randint(key0, (N,), 0, B, jnp.int32))
ecnt = jax.random.randint(key0, (N,), 0, 4, jnp.int32)


def st_rows_gather(c, d, e):
    return jnp.sum(d.at[e].get(mode="fill", fill_value=0.0)) * 1e-30 + c * 0


def st_cumsum(c, d):
    return jnp.sum(jnp.cumsum(d + c * 1e-30, axis=0)) * 1e-30


def st_boundary(c, cs, s0, ct):
    hi = cs.at[jnp.clip(s0 + ct - 1, 0, B - 1)].get(mode="clip")
    lo = cs.at[s0 - 1].get(mode="fill", fill_value=0.0)
    return jnp.sum(hi - lo) * 1e-30 + c * 0


cs0 = jnp.cumsum(drows, axis=0)
timeit("VJP rows gather [B,16]", st_rows_gather, drows, ekr)
timeit("VJP cumsum [B,16]", st_cumsum, drows)
timeit("VJP boundary gathers [N,16]x2", st_boundary, cs0, estart, ecnt)


def st_vjp_all(c, d, e, s0, ct):
    rows = d.at[e].get(mode="fill", fill_value=0.0)
    cs = jnp.cumsum(rows + c * 1e-30, axis=0)
    hi = cs.at[jnp.clip(s0 + ct - 1, 0, B - 1)].get(mode="clip")
    lo = cs.at[s0 - 1].get(mode="fill", fill_value=0.0)
    return jnp.sum(hi - lo) * 1e-30


timeit("VJP glue (gather+cumsum+bnd)", st_vjp_all, drows, ekr, estart, ecnt)

# --- window-params gather (pack glue)
from gsplat_tpu.render import blend_pallas
ptab = jax.random.normal(key0, (N, 16), jnp.float32)
ig = jax.random.randint(key0, (B,), 0, N, jnp.int32)


def st_wparams(c, p, g):
    cpad = jnp.pad(p, ((0, 0), (0, blend_pallas.PARAM_LANES - 16)))
    idx = jnp.concatenate([g, jnp.full((64,), N, jnp.int32)])
    out = cpad.at[idx].get(mode="fill", fill_value=0.0)
    return jnp.sum(out[:, :16]) * 1e-30 + c * 0


timeit("window-params gather [B,128]", st_wparams, ptab, ig)
