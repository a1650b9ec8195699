"""Scaling benchmark for the sharded render path (BASELINE.md "scaling
efficiency" metric; VERDICT r2 task #4).

Runs on the virtual 8-device CPU mesh (no pod needed) and measures, for
D in {1, 2, 4, 8} devices:

- ``inst_max``: the max per-device BAND instance count (each device bins
  only its horizontal tile band after the all-gather, so this is the
  per-device binning + blend workload). Ideal scaling: total/D.
- ``win_max``: max per-device window count (the Pallas grid size).
- ``bin_ms``: walltime of one device's band binning program (jitted
  ``bin_windows`` + parameter gather at the measured per-band budget) —
  the XLA glue whose per-device cost the r2 review flagged as O(N). CPU
  walltime, RELATIVE numbers only.
- ``gather_mb``: all-gather receive volume per device (compact table).

Efficiencies are reported against the D=1 run:
  inst_eff = inst(1) / (D * inst_max(D))   — work-partition efficiency
  bin_eff  = bin_ms(1) / (D * bin_ms(D))   — glue-walltime efficiency

Writes SCALING.json and prints one JSON line per D. The Pallas blend
kernel itself is not timed here (interpret mode on CPU is not
representative); its per-device work is proportional to ``win_max``.

Usage: python bench_sharded.py [--num-gaussians 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# force CPU unconditionally: the axon remote-TPU plugin presets
# JAX_PLATFORMS, so setdefault would silently land this on the real chip
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import Config
    from gsplat_tpu.io.cameras import look_at_camera
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.parallel.render_sharded import (COMPACT_COLS,
                                                    band_layout,
                                                    measure_budgets_sharded)
    from gsplat_tpu.render.api import _window_params, pack_table
    from gsplat_tpu.render.projection import CameraParams, project
    from gsplat_tpu.render.tiles import bin_windows, count_instances

    cfg = Config()
    rc, ts = cfg.raster, cfg.raster.tile_size
    w, h = args.width, args.height
    cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=w,
                         height=h)
    scene = random_scene(args.num_gaussians, seed=0, extent=1.5,
                         scale_range=(0.004, 0.02), num_labels=16)
    camp = CameraParams.from_camera(cam)
    proj = project(scene, camp, w, h, rc, z_near=cfg.camera.z_near,
                   z_far=cfg.camera.z_far)
    n = scene.num_gaussians

    def band_time(projd, tiles_x, band_ty, budget, kb, nw):
        """One device's binning + parameter-gather program, jitted.
        bench.py methodology: traced iteration count (ONE compile), median
        of 5, slope between two well-separated counts."""
        import statistics

        ptab = pack_table(projd, jnp.asarray(scene.labels))

        @jax.jit
        def run(p, pt, iters):
            def body(i, c):
                pp = p._replace(means2d=p.means2d + c * 1e-30)
                b = bin_windows(pp, tiles_x=tiles_x, tiles_y=band_ty,
                                tile_size=ts, chunk=cfg.tiles.chunk,
                                budget=budget, kernel_budget=kb,
                                num_windows=nw, wpg=cfg.tiles.wpg)
                prm = _window_params(pt, b.inst_gauss, cfg.tiles.chunk,
                                     cfg.tiles.wpg)
                return (c + prm[0, 0] * 1e-30
                        + b.win_len[0].astype(jnp.float32) * 1e-30)
            return jax.lax.fori_loop(0, iters, body, 0.0)

        def timed(n):
            t0 = time.time()
            float(run(projd, ptab, n))
            return time.time() - t0

        timed(1)  # compile once (iters is traced)
        n_hi, n_lo = args.iters + 1, max(args.iters // 4, 1)
        dt_hi = statistics.median(timed(n_hi) for _ in range(5))
        dt_lo = statistics.median(timed(n_lo) for _ in range(5))
        return max((dt_hi - dt_lo) / (n_hi - n_lo), 1e-6)

    results = []
    for d in (1, 2, 4, 8):
        tiles_x, _, band_ty, band_h = band_layout(w, h, ts, d)
        budget, kb, nw = measure_budgets_sharded(
            scene, camp, width=w, height=h, cfg=cfg, num_devices=d)
        # find the heaviest band (max per-device work) and time that device
        inst_max, dev_heavy = -1, 0
        for dev in range(d):
            projd = proj._replace(means2d=proj.means2d - jnp.asarray(
                [0.0, dev * band_h], jnp.float32)[None, :])
            c = int(count_instances(projd, tiles_x=tiles_x, tiles_y=band_ty,
                                    tile_size=ts))
            if c > inst_max:
                inst_max, dev_heavy = c, dev
        projd = proj._replace(means2d=proj.means2d - jnp.asarray(
            [0.0, dev_heavy * band_h], jnp.float32)[None, :])
        t_max = band_time(projd, tiles_x, band_ty, budget, kb, nw)
        gather_mb = n * COMPACT_COLS * 4 / 1e6
        results.append(dict(devices=d, inst_max=inst_max,
                            budget_per_device=budget, win_max=nw,
                            bin_ms=round(t_max * 1e3, 3),
                            gather_mb=round(gather_mb, 2)))

    base = results[0]
    for r in results:
        d = r["devices"]
        r["inst_eff"] = round(base["inst_max"] / (d * r["inst_max"]), 4)
        r["bin_eff"] = round(base["bin_ms"] / (d * r["bin_ms"]), 4)
        print(json.dumps(r))

    artifact = dict(
        metric="per-device binning work + glue walltime vs D (CPU-relative)",
        scene=dict(num_gaussians=n, width=w, height=h),
        backend=jax.default_backend(),
        results=results,
        note="inst_eff/bin_eff = D=1 work / (D * per-device work); blend "
             "kernel work scales with win_max. CPU virtual mesh — relative "
             "numbers, not absolute TPU walltime.",
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
