"""Benchmark: fwd+bwd differentiable rasterization throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is the
ratio against NOMINAL_TARGET, the north-star figure for speed-of-light-80%
tile throughput on this class of scene (BASELINE.json: ">= SOL-80% blend
kernel throughput per chip").

Secondary diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

NOMINAL_TARGET = 100.0  # Mpix/s/chip fwd+bwd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--forward-only", action="store_true")
    args = ap.parse_args()

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
    cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0),
                         width=args.width, height=args.height)
    scene = random_scene(args.num_gaussians, seed=0, extent=1.5,
                         scale_range=(0.004, 0.02), num_labels=16)
    camp = CameraParams.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)

    def render_image(s):
        out = _render_impl(
            s, camp, bg, width=args.width, height=args.height, cfg=cfg,
            with_labels=False, impl="pallas", interpret=interpret,
            budget=args.budget)
        return out["image"], out["num_dropped"]

    if args.forward_only:
        @jax.jit
        def step(s):
            img, nd = render_image(s)
            return jnp.mean(img), nd
    else:
        @jax.jit
        def step(s):
            def loss_fn(params: SceneParams):
                img, nd = render_image(params.to_scene(s.labels))
                return 0.5 * jnp.sum((img - target) ** 2), nd
            (loss, nd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(SceneParams.from_scene(s))
            # fold grads into a scalar so nothing is dead code
            gsum = sum(jnp.sum(jnp.abs(g)) for g in grads)
            return loss + 0.0 * gsum, nd

        step = step

    t0 = time.time()
    val, dropped = step(scene)
    jax.block_until_ready(val)
    compile_s = time.time() - t0
    print(f"compile: {compile_s:.1f}s dropped={int(dropped)}", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.iters):
        val, dropped = step(scene)
    jax.block_until_ready(val)
    dt = (time.time() - t0) / args.iters
    mpix = args.width * args.height / dt / 1e6

    mode = "fwd" if args.forward_only else "fwd+bwd"
    print(f"{mode}: {dt*1e3:.2f} ms/frame", file=sys.stderr)
    print(json.dumps({
        "metric": f"Mpix/s/chip {mode} rasterization "
                  f"({args.num_gaussians} gaussians, "
                  f"{args.width}x{args.height})",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / NOMINAL_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
