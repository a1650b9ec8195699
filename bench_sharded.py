"""Scaling benchmark for the sharded render path (BASELINE.md "scaling
efficiency" metric; VERDICT r3 tasks #1/#2).

Runs on the virtual 8-device CPU mesh (no pod needed) and measures, for
D in {1, 2, 4, 8} devices under the 2D-INTERLEAVED tile lattice + the
overlap-culled all_to_all exchange:

- ``inst_max``: max per-device tight instance count (the per-device blend
  workload). Ideal: total/D. The tile lattice stratifies center-heavy
  scenes, so this partitions near-perfectly (contiguous bands measured
  0.72-0.74 at D=8 in r3).
- ``win_max``: max per-device window count — the Pallas kernel grid, i.e.
  the per-device KERNEL work.
- ``bin_ms``: walltime of one device's per-frame glue program (exchange
  compaction + binning + parameter gather) at the measured per-device
  budgets. CPU walltime, RELATIVE numbers only.
- ``exch_mb``: a2a receive volume per device (D * capacity * 64B) vs the
  all-gather fallback's N * 64B.

Efficiencies vs the D=1 run:
  inst_eff = inst(1) / (D * inst_max(D))    — work-partition efficiency
  win_eff  = win(1)  / (D * win_max(D))     — kernel-grid efficiency
  bin_eff  = bin(1)  / (D * bin_ms(D))      — glue-walltime efficiency
  step_eff — full fwd+bwd step composite: the Pallas kernels' walltime
  scales with win_max and the glue's with bin_ms; weighting the two by the
  REAL-TPU D=1 frame split (BASELINE.md: kernels ~9.9 ms, glue ~4.0 ms)
  gives  step_eff = (Tk + Tg) / (D * (Tk*win_max/win1 + Tg*bin/bin1)).
  (The Pallas kernels themselves cannot be timed here: interpret mode on
  CPU is 1000x off; their work IS the window count.)

Writes SCALING.json and prints one JSON line per D.

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

# Real-TPU D=1 frame split (BASELINE.md r3/r4): blend kernels ~9.9 ms
# (fwd 3.7 + bwd 6.3, ~SOL), glue ~4.0 ms. Only the RATIO enters step_eff.
TPU_KERNEL_MS = 9.9
TPU_GLUE_MS = 4.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--direct-gaussians", type=int, default=4096,
                    help="scene size for the DIRECT end-to-end sharded "
                         "train-step timing (interpret blend)")
    ap.add_argument("--direct-size", type=int, nargs=2, default=(256, 256),
                    help="image size for the direct step timing")
    ap.add_argument("--direct-steps", type=int, default=3)
    ap.add_argument("--skip-direct", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import Config
    from gsplat_tpu.io.cameras import look_at_camera
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.parallel.render_sharded import (COMPACT_COLS,
                                                    _overlap_mask,
                                                    _pack_compact,
                                                    grid_layout,
                                                    measure_budgets_sharded)
    from gsplat_tpu.render.api import _window_params, pack_table
    from gsplat_tpu.render.projection import CameraParams, project
    from gsplat_tpu.render.tiles import bin_windows, count_instances_tight

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
    labels = jnp.asarray(scene.labels)

    def device_time(d, dev, dy, dx, tx_l, ty_l, budget, kb, nw, cap):
        """One device's per-frame glue at D=d: a2a-exchange compaction of
        its shard (the local scatter work; the collective itself is wired
        by GSPMD) + strided binning + parameter gather. jitted; bench.py
        methodology (traced iteration count, interleaved hi/lo slope)."""
        import statistics

        n_shard = n // d
        shard = jax.tree.map(lambda x: x[dev * n_shard:(dev + 1) * n_shard],
                             proj)
        shard_compact = _pack_compact(shard, labels[dev * n_shard:
                                                    (dev + 1) * n_shard])
        ptab_full = pack_table(proj, labels)
        # received set ~ the splats overlapping this device's rows; for the
        # timing program use the first d*cap rows of the full table (same
        # shapes/cost as the real post-exchange operand)
        recvN = min(d * cap, n)

        @jax.jit
        def run(p, shard_c, pt, iters):
            def body(i, c):
                pp = p._replace(u=p.u + c * 1e-30)
                # exchange compaction: per-dest cull + fixed-capacity pack
                acc = c
                if d > 1:
                    sc = shard_c + c * 1e-30
                    for e in range(d):
                        m = _overlap_mask(
                            jax.tree.map(
                                lambda x: x[dev * n_shard:(dev + 1) * n_shard],
                                pp),
                            e // dx, e % dx, dy, dx, ty_l, tx_l, float(ts))
                        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
                        idx = jnp.where(m, pos, cap)
                        buf = jnp.zeros((cap, COMPACT_COLS), jnp.float32
                                        ).at[idx].set(sc, mode="drop")
                        acc = acc + buf[0, 0] * 1e-30
                projr = jax.tree.map(lambda x: x[:recvN], pp)
                b = bin_windows(projr, tiles_x=tx_l, tiles_y=ty_l,
                                tile_size=ts, chunk=cfg.tiles.chunk,
                                budget=budget, kernel_budget=kb,
                                num_windows=nw, wpg=cfg.tiles.wpg,
                                row_stride=dy, row_phase=dev // dx,
                                col_stride=dx, col_phase=dev % dx)
                prm = _window_params(pt[:recvN], b.inst_gauss,
                                     cfg.tiles.chunk, cfg.tiles.wpg)
                return (acc + prm[0, 0] * 1e-30
                        + b.win_len[0].astype(jnp.float32) * 1e-30)
            return jax.lax.fori_loop(0, iters, body, 0.0)

        def timed(k):
            t0 = time.time()
            float(run(proj, shard_compact, ptab_full, k))
            return time.time() - t0

        timed(1)  # compile once (iters is traced)
        n_hi, n_lo = args.iters + 1, max(args.iters // 4, 1)
        dt_hi = statistics.median(timed(n_hi) for _ in range(5))
        dt_lo = statistics.median(timed(n_lo) for _ in range(5))
        return max((dt_hi - dt_lo) / (n_hi - n_lo), 1e-6)

    results = []
    for d in (1, 2, 4, 8):
        dy, dx, tx_l, ty_l = grid_layout(w, h, ts, d)
        budget, kb, nw, cap = measure_budgets_sharded(
            scene, camp, width=w, height=h, cfg=cfg, num_devices=d)
        # heaviest device under interleaved ownership (they are near-equal)
        inst_max, dev_heavy = -1, 0
        for dev in range(d):
            c = int(count_instances_tight(
                proj, tiles_x=tx_l, tiles_y=ty_l, tile_size=ts,
                budget=budget, row_stride=dy, row_phase=dev // dx,
                col_stride=dx, col_phase=dev % dx))
            if c > inst_max:
                inst_max, dev_heavy = c, dev
        t_max = device_time(d, dev_heavy, dy, dx, tx_l, ty_l, budget, kb,
                            nw, cap)
        exch_mb = (d * cap if d > 1 else n) * COMPACT_COLS * 4 / 1e6
        results.append(dict(devices=d, inst_max=inst_max,
                            budget_per_device=budget, win_max=nw,
                            exchange_capacity=(cap if d > 1 else n),
                            bin_ms=round(t_max * 1e3, 3),
                            exch_mb=round(exch_mb, 2)))

    base = results[0]
    for r in results:
        d = r["devices"]
        r["inst_eff"] = round(base["inst_max"] / (d * r["inst_max"]), 4)
        r["win_eff"] = round(base["win_max"] / (d * r["win_max"]), 4)
        r["bin_eff"] = round(base["bin_ms"] / (d * r["bin_ms"]), 4)
        t1 = TPU_KERNEL_MS + TPU_GLUE_MS
        td = (TPU_KERNEL_MS * r["win_max"] / base["win_max"]
              + TPU_GLUE_MS * r["bin_ms"] / base["bin_ms"])
        r["step_eff"] = round(t1 / (d * td), 4)
        print(json.dumps(r))

    # --- DIRECT end-to-end timing of the REAL sharded train step --------
    # VERDICT r4 task 3: the composite above models the kernel/glue split;
    # this times the actual jitted make_train_step(mesh=...) program —
    # projection, a2a exchange, binning, interpret-mode Pallas blend
    # fwd+bwd, collective gradient return, optimizer — at each D on a
    # small scene (interpret is ~1000x off in absolute terms; only
    # RELATIVE numbers across D mean anything).
    #
    # Host-core caveat: this machine has os.cpu_count() cores; with D
    # virtual devices > cores the D shard programs time-share the cores,
    # so under PERFECT scaling wall(D) flattens at wall(cores), not
    # wall(1)/D. eff_direct therefore normalizes by min(D, cores):
    # eff_direct = t(1) / (t(D) * min(D, cores)).
    direct = []
    if not args.skip_direct:
        import statistics

        from gsplat_tpu.models import trainer
        from gsplat_tpu.parallel import mesh as mesh_lib

        cores = os.cpu_count() or 1
        nd_s = args.direct_gaussians
        w_s, h_s = args.direct_size
        scene_s = random_scene(nd_s, seed=3, extent=1.2,
                               scale_range=(0.01, 0.05), num_labels=8)
        cam_s = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0),
                               width=w_s, height=h_s)
        camp_s = CameraParams.from_camera(cam_s)
        target = jnp.zeros((h_s, w_s, 3), jnp.float32)
        bg = jnp.zeros(3, jnp.float32)
        for d in (1, 2, 4, 8):
            mesh = mesh_lib.make_mesh((1, d), devices=jax.devices()[:d])
            budget, kb, nw, cap = measure_budgets_sharded(
                scene_s, camp_s, width=w_s, height=h_s, cfg=cfg,
                num_devices=d)
            sharded = mesh_lib.shard_scene(scene_s, mesh)
            step = trainer.make_train_step(
                (w_s, h_s), cfg, lr=1e-3, budget=budget, mesh=mesh,
                budget_per_device=budget, interpret=True,
                exchange_capacity=cap)
            state = trainer.init_state(sharded, lr=1e-3)
            lbl = sharded.labels

            def run_steps(k, state=state):
                s = state
                t0 = time.time()
                for _ in range(k):
                    s, loss, nd_drop = step(s, lbl, camp_s, target, bg)
                float(loss)  # sync
                return time.time() - t0

            run_steps(1)  # compile
            k_hi, k_lo = args.direct_steps + 1, 1
            pairs = []
            for _ in range(3):
                a, b = run_steps(k_hi), run_steps(k_lo)
                if a > b:
                    pairs.append((a - b) / (k_hi - k_lo))
            t_step = statistics.median(pairs) if pairs else float("nan")
            direct.append(dict(devices=d, step_ms=round(t_step * 1e3, 2)))
            print(json.dumps(direct[-1]), file=sys.stderr)
        t1 = direct[0]["step_ms"]
        for r in direct:
            r["step_eff_direct"] = round(
                t1 / (r["step_ms"] * min(r["devices"], cores)), 4)
        for r, rr in zip(results, direct):
            if r["devices"] == rr["devices"]:
                r["step_ms_direct"] = rr["step_ms"]
                r["step_eff_direct"] = rr["step_eff_direct"]

    artifact = dict(
        metric="per-device fwd+bwd step work + glue walltime vs D "
               "(CPU-relative; 2D-interleaved tiles + a2a exchange)",
        scene=dict(num_gaussians=n, width=w, height=h),
        backend=jax.default_backend(),
        host_cores=os.cpu_count(),
        direct_step=dict(
            scene=dict(num_gaussians=args.direct_gaussians,
                       width=args.direct_size[0],
                       height=args.direct_size[1]),
            note="step_ms = wall time of ONE full jitted sharded train "
                 "step (projection + a2a exchange + binning + interpret "
                 "Pallas blend fwd+bwd + transposed-collective gradient "
                 "return + optimizer) on the virtual CPU mesh; "
                 "eff_direct normalizes by min(D, host_cores) because D "
                 "shard programs time-share the cores (perfect scaling "
                 "=> wall flattens at wall(cores)).",
            results=direct,
        ) if direct else None,
        results=results,
        note="inst/win/bin_eff = D=1 work / (D * per-device work|walltime). "
             "step_eff composites kernel work (prop. to win_max) and glue "
             f"walltime with the real-TPU D=1 split ({TPU_KERNEL_MS} ms "
             f"kernels / {TPU_GLUE_MS} ms glue, BASELINE.md) — interpret-"
             "mode Pallas on CPU cannot time the kernels directly. "
             "exch_mb = per-device a2a receive volume (all-gather would be "
             f"{round(n * COMPACT_COLS * 4 / 1e6, 1)} MB at any D).",
    )
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
