"""Benchmark: fwd+bwd differentiable rasterization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is the
ratio against the DERIVED speed-of-light for the blend kernels on this
chip (BASELINE.md "Derived speed-of-light"; regenerate with
scripts/roofline.py -> ROOFLINE.json): measured VPU f32 / exp rates x the
kernels' per-(gaussian, pixel) op counts + measured grid-step overhead.
BASELINE.json north star: ">= SOL-80% blend kernel throughput per chip".

Secondary diagnostics go to stderr (including the old nominal-100 ratio
for cross-round comparability).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

NOMINAL_TARGET = 100.0  # Mpix/s/chip fwd+bwd (r1/r2 nominal, stderr only)
# Derived kernel speed-of-light on the bench scene (BASELINE.md derivation;
# ROOFLINE.json overrides when present).
SOL_MPIX_DEFAULT = 49.2


def _sol_mpix() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ROOFLINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["sol_mpix_per_s"])
    except Exception:
        return SOL_MPIX_DEFAULT


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget", type=int, default=None,
                    help="instance budget (default: measured + bucketed)")
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--repeats", type=int, default=9,
                    help="interleaved (hi, lo) timing pairs; the JSON line "
                         "reports their median + min/max spread")
    ap.add_argument("--tile-size", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--wpg", type=int, default=None,
                    help="windows per Pallas grid step")
    args = ap.parse_args()

    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import Config
    from gsplat_tpu.io.cameras import look_at_camera
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.models.trainer import SceneParams
    from gsplat_tpu.render.api import _render_impl
    from gsplat_tpu.render.projection import CameraParams

    interpret = jax.default_backend() not in ("tpu", "axon")
    print(f"backend={jax.default_backend()} interpret={interpret}",
          file=sys.stderr)

    cfg = Config()
    if args.tile_size is not None:
        cfg = _dc.replace(cfg, raster=_dc.replace(
            cfg.raster, tile_size=args.tile_size))
    if args.chunk is not None:
        cfg = _dc.replace(cfg, tiles=_dc.replace(cfg.tiles, chunk=args.chunk))
    if args.wpg is not None:
        cfg = _dc.replace(cfg, tiles=_dc.replace(cfg.tiles, wpg=args.wpg))
    cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0),
                         width=args.width, height=args.height)
    scene = random_scene(args.num_gaussians, seed=0, extent=1.5,
                         scale_range=(0.004, 0.02), num_labels=16)
    camp = CameraParams.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)

    kernel_budget = None
    num_windows = None
    if args.budget is None:
        from gsplat_tpu.render.api import measure_budgets
        args.budget, kernel_budget, num_windows = measure_budgets(
            scene, cam, cfg)
        print(f"budget={args.budget} kernel_budget={kernel_budget} "
              f"num_windows={num_windows}", file=sys.stderr)

    def render_image(s):
        out = _render_impl(
            s, camp, bg, width=args.width, height=args.height, cfg=cfg,
            with_labels=False, impl="pallas", interpret=interpret,
            budget=args.budget, kernel_budget=kernel_budget,
            num_windows=num_windows)
        return out["image"], out["num_dropped"]

    import dataclasses

    def perturb(s, c):
        # genuine data dependency so XLA cannot hoist the render out of the
        # timing loop (c is ~1e-30, numerically invisible)
        return dataclasses.replace(s, means=s.means + c * 1e-30)

    if args.forward_only:
        def one(s, c):
            img, nd = render_image(perturb(s, c))
            return img[0, 0, 0] * 1e-30 + nd.astype(jnp.float32) * 0.0
    else:
        def one(s, c):
            def loss_fn(params: SceneParams):
                img, nd = render_image(params.to_scene(s.labels))
                return 0.5 * jnp.sum((img - target) ** 2), nd
            (loss, nd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(SceneParams.from_scene(perturb(s, c)))
            return grads.means[0, 0] * 1e-30 + loss * 1e-30

    @jax.jit
    def run(s, n):  # n is traced: one compile, any iteration count.
        # NOTE: on the axon remote backend block_until_ready does not block;
        # fetching a scalar is the only reliable sync.
        return jax.lax.fori_loop(0, n, lambda i, c: one(s, c), 0.0)

    t0 = time.time()
    float(run(scene, 1))
    compile_s = time.time() - t0
    out = _render_impl(scene, camp, bg, width=args.width, height=args.height,
                       cfg=cfg, with_labels=False, impl="pallas",
                       interpret=interpret, budget=args.budget,
                       kernel_budget=kernel_budget)
    print(f"compile: {compile_s:.1f}s dropped={int(out['num_dropped'])}",
          file=sys.stderr)

    def timed(n):
        t0 = time.time()
        float(run(scene, n))
        return time.time() - t0

    # remote-tunnel RTT jitters by tens of ms AND drifts on a ~10s scale,
    # and chip contention drifts the rate itself by ~±30% over minutes
    # (BASELINE.md r3.3 note). Contention-proofing (VERDICT r3 task 4):
    # interleave (hi, lo) measurement PAIRS — the slope differences each hi
    # against an adjacent lo, cancelling slow drift — then report the
    # MEDIAN per-pair throughput plus the min/max spread, so the artifact
    # carries its own error bar and back-to-back invocations agree within
    # the reported spread.
    import statistics

    # Degenerate pairs (contention makes the hi run no slower than the lo
    # run, a - b <= 0, or implausibly fast vs the running median) are
    # DISCARDED AND RE-MEASURED, never clamped (VERDICT r4 weak #2: the
    # old 1 µs clamp put a 486,400 Mpix/s bound in the artifact and biased
    # the median).
    n_hi, n_lo = args.iters + 1, max(args.iters // 4, 1)
    per_pair_dt = []
    attempts, max_attempts = 0, 4 * args.repeats
    while len(per_pair_dt) < args.repeats and attempts < max_attempts:
        attempts += 1
        a = timed(n_hi)
        b = timed(n_lo)
        pair_dt = (a - b) / (n_hi - n_lo)
        if pair_dt <= 0:
            print(f"discarding degenerate pair (hi {a*1e3:.1f} ms <= "
                  f"lo {b*1e3:.1f} ms); re-measuring", file=sys.stderr)
            continue
        if per_pair_dt and pair_dt < 0.25 * statistics.median(per_pair_dt):
            print(f"discarding implausible pair ({pair_dt*1e3:.3f} ms/frame"
                  f" < 0.25x running median); re-measuring", file=sys.stderr)
            continue
        per_pair_dt.append(pair_dt)
    if len(per_pair_dt) < max(3, args.repeats // 2):
        print(f"FATAL: only {len(per_pair_dt)} valid timing pairs in "
              f"{attempts} attempts — chip too contended for a meaningful "
              f"number; rerun later", file=sys.stderr)
        sys.exit(1)
    px_frame = args.width * args.height
    per_pair_mpix = [px_frame / dt / 1e6 for dt in per_pair_dt]
    dt = statistics.median(per_pair_dt)
    mpix = statistics.median(per_pair_mpix)
    lo_m, hi_m = min(per_pair_mpix), max(per_pair_mpix)
    import math
    assert all(map(math.isfinite, (mpix, lo_m, hi_m))) and hi_m < 10_000, \
        f"insane spread [{lo_m}, {hi_m}] — refusing to write the artifact"

    mode = "fwd" if args.forward_only else "fwd+bwd"
    sol = _sol_mpix()
    print(f"{mode}: {dt*1e3:.2f} ms/frame (median of {args.repeats} "
          f"interleaved pairs; spread {px_frame/hi_m/1e3:.2f}-"
          f"{px_frame/lo_m/1e3:.2f} ms)", file=sys.stderr)
    # secondary BASELINE.md metric: (gaussian, pixel) blend evaluations/s
    ts = cfg.raster.tile_size
    pairs = args.budget * ts * ts
    print(f"gaussian-pixel blends/s: {pairs / dt / 1e9:.1f}G "
          f"({args.budget} instances x {ts*ts} px/frame)", file=sys.stderr)
    print(f"derived kernel SOL: {sol:.1f} Mpix/s -> {100*mpix/sol:.1f}% of "
          f"SOL; vs r1/r2 nominal-100: {mpix/NOMINAL_TARGET:.4f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"Mpix/s/chip {mode} rasterization "
                  f"({args.num_gaussians} gaussians, "
                  f"{args.width}x{args.height}); vs_baseline = fraction of "
                  f"the derived blend-kernel speed-of-light "
                  f"({sol:.1f} Mpix/s, BASELINE.md); median of "
                  f"{args.repeats} interleaved timing pairs",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / sol, 4),
        "value_median": round(mpix, 2),
        "value_spread": [round(lo_m, 2), round(hi_m, 2)],
    }))


if __name__ == "__main__":
    main()
