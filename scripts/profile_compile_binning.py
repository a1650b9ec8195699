"""Which part of bin_windows costs 18s of XLA compile? Cumulative stages."""
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
from gsplat_tpu.render.tiles import _rect_min_q, _tile_bbox

W, H, N = 800, 608, 100_000
cfg = Config()
cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=W, height=H)
scene = random_scene(N, seed=0, extent=1.5, scale_range=(0.004, 0.02))
camp = CameraParams.from_camera(cam)
tx, ty = tile_grid(W, H, cfg.raster.tile_size)
ts = float(cfg.raster.tile_size)
num_tiles = tx * ty
budget, kernel_budget, chunk = 246528, 246528, 64
k_static = 4136
proj0 = project(scene, camp, W, H, cfg.raster)


def stage(upto):
    def f(proj):
        n = proj.depth.shape[0]
        depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        if upto == "argsort":
            return rank.sum()
        u, v = proj.means2d[:, 0], proj.means2d[:, 1]
        x0, y0, bw, cnt = _tile_bbox(u, v, proj.extent[:, 0],
                                     proj.extent[:, 1], proj.valid, ts,
                                     tx, ty)
        offsets = jnp.cumsum(cnt) - cnt
        total = offsets[-1] + cnt[-1]
        j = jnp.arange(budget, dtype=jnp.int32)
        marks = jnp.zeros((budget,), jnp.int32).at[offsets].add(
            1, mode="drop", indices_are_sorted=True)
        g = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
        inside = j < total
        etab = jnp.stack([
            offsets.astype(jnp.float32),
            jnp.maximum(bw, 1).astype(jnp.float32),
            x0.astype(jnp.float32), y0.astype(jnp.float32),
            rank.astype(jnp.float32),
            u, v, proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.qmax,
        ] + [jnp.zeros((n,), jnp.float32)] * 5, axis=1)
        erow = etab.at[g].get(indices_are_sorted=True)
        if upto == "gather":
            return erow.sum()
        e_off = erow[:, 0].astype(jnp.int32)
        e_rank = erow[:, 4].astype(jnp.int32)
        local = j - e_off
        bw_g = erow[:, 1]
        row = jnp.floor((local.astype(jnp.float32) + 0.5) / bw_g)
        col = (local.astype(jnp.float32) - row * bw_g).astype(jnp.int32)
        row = row.astype(jnp.int32)
        tcol = erow[:, 2].astype(jnp.int32) + col
        trow = erow[:, 3].astype(jnp.int32) + row
        tile = trow * tx + tcol
        min_q = _rect_min_q(erow[:, 5], erow[:, 6], erow[:, 7], erow[:, 8],
                            erow[:, 9], tcol.astype(jnp.float32) * ts,
                            trow.astype(jnp.float32) * ts, ts)
        keep = inside & (min_q <= erow[:, 10])
        if upto == "filter":
            return keep.sum()
        rank_bits = max((n - 1).bit_length(), 1)
        key = (tile << rank_bits) | e_rank
        key = jnp.where(keep, key, (num_tiles << rank_bits) | e_rank)
        if upto == "sort-nokey":
            keys = jax.lax.sort(key, is_stable=False)
            return keys.sum()
        keys, je_sorted = jax.lax.sort((key, j), num_keys=1)
        if upto == "sort":
            return keys.sum() + je_sorted.sum()
        ranks = keys & ((1 << rank_bits) - 1)
        bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits
        tile_start = jnp.searchsorted(keys, bounds, side="left"
                                      ).astype(jnp.int32)
        n_t = jnp.diff(tile_start)
        tile_start = tile_start[:num_tiles]
        tight = jnp.sum(keep.astype(jnp.int32))
        over = tight > kernel_budget
        scale = jnp.where(over, kernel_budget / jnp.maximum(tight, 1), 1.0)
        n_keep = jnp.where(over, jnp.floor(
            n_t.astype(jnp.float32) * scale).astype(jnp.int32), n_t)
        nw = jnp.maximum(-(-n_keep // chunk), 1)
        wstart_t = jnp.cumsum(nw) - nw
        kk = jnp.arange(k_static, dtype=jnp.int32)
        seed = jnp.zeros((k_static,), jnp.int32).at[wstart_t].max(
            jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
        win_tile = jax.lax.cummax(seed)
        local_w = kk - wstart_t[win_tile]
        win_start = tile_start[win_tile] + local_w * chunk
        win_len = jnp.clip(n_keep[win_tile] - local_w * chunk, 0, chunk)
        if upto == "windows":
            return win_start.sum() + win_len.sum() + ranks.sum()
        wids = jnp.arange(k_static, dtype=jnp.int32)
        w_of_s = jax.lax.cummax(
            jnp.zeros((budget,), jnp.int32).at[win_start].max(
                wids, mode="drop"))
        ws_of_s = jax.lax.cummax(
            jnp.zeros((budget,), jnp.int32).at[win_start].max(
                win_start, mode="drop"))
        we_of_s = jax.lax.cummax(
            jnp.zeros((budget,), jnp.int32).at[win_start].max(
                win_start + win_len, mode="drop"))
        base = (ws_of_s // 8) * 8
        kernel_row = w_of_s * 72 + (j - base)
        krows = k_static * 72
        kernel_row = jnp.where(j < we_of_s, kernel_row, krows)
        ekr = jnp.full((budget,), krows, jnp.int32).at[je_sorted].set(
            kernel_row, mode="drop", unique_indices=True)
        return ekr.sum() + win_start.sum()
    return f


for upto in ["argsort", "gather", "filter", "sort-nokey", "sort",
             "windows", "full"]:
    t0 = time.time()
    jax.jit(stage(upto)).lower(proj0).compile()
    print(f"upto {upto:12s} {time.time()-t0:7.1f} s")
