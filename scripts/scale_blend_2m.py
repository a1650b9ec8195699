"""Execute the Pallas blend at N=2M on ONE real TPU chip (VERDICT r4 task 2a).

The r4 EXCHANGE.json audited the sharded exchange at N=2M but excluded the
blend kernels (interpret mode on CPU is ~1000x off at that scale); the
"a scene larger than one chip's HBM shard can be rendered" claim therefore
rested on operand-size arithmetic. This script RUNS the full render —
projection + binning + Pallas blend, forward AND backward — on a 2M-gaussian
synthetic scene at 800x608 on the real chip, recording ms/frame and
asserting num_dropped == 0, and writes SCALE_r05.json (merged by
scripts/scale_blend_sharded.py which adds the on-mesh half).

Usage: python scripts/scale_blend_2m.py [--num-gaussians 2000000]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=2_000_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="SCALE_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.config import Config
    from gsplat_tpu.io.cameras import look_at_camera
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.models.trainer import SceneParams
    from gsplat_tpu.render.api import _render_impl, measure_budgets
    from gsplat_tpu.render.projection import CameraParams

    interpret = jax.default_backend() not in ("tpu", "axon")
    cfg = Config()
    w, h, n = args.width, args.height, args.num_gaussians
    print(f"backend={jax.default_backend()} n={n} {w}x{h}", file=sys.stderr)
    # same distribution as the r4 2M exchange audit
    scene = random_scene(n, seed=0, extent=1.5, scale_range=(0.002, 0.008),
                        num_labels=16)
    cam = look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0), width=w,
                         height=h)
    camp = CameraParams.from_camera(cam)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((h, w, 3), jnp.float32)

    t0 = time.time()
    budget, kb, nw = measure_budgets(scene, cam, cfg)
    print(f"budgets: {budget} kernel={kb} windows={nw} "
          f"(measured in {time.time()-t0:.1f}s); window params "
          f"~{(budget + 64) * 128 * 4 / 1e6:.0f} MB", file=sys.stderr)

    def render_image(s):
        out = _render_impl(s, camp, bg, width=w, height=h, cfg=cfg,
                           with_labels=False, impl="pallas",
                           interpret=interpret, budget=budget,
                           kernel_budget=kb, num_windows=nw)
        return out["image"], out["num_dropped"]

    import dataclasses

    def fwd_bwd(s, c):
        def loss_fn(params: SceneParams):
            img, nd = render_image(params.to_scene(s.labels))
            return 0.5 * jnp.sum((img - target) ** 2), nd
        (loss, nd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            SceneParams.from_scene(dataclasses.replace(
                s, means=s.means + c * 1e-30)))
        return grads.means[0, 0] * 1e-30 + loss * 1e-30

    @jax.jit
    def run(s, k):
        return jax.lax.fori_loop(0, k, lambda i, c: fwd_bwd(s, c), 0.0)

    t0 = time.time()
    float(run(scene, 1))
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)
    out = _render_impl(scene, camp, bg, width=w, height=h, cfg=cfg,
                       with_labels=False, impl="pallas", interpret=interpret,
                       budget=budget, kernel_budget=kb, num_windows=nw)
    nd = int(out["num_dropped"])
    img_mean = float(jnp.mean(out["image"]))
    print(f"num_dropped={nd} image mean={img_mean:.4f}", file=sys.stderr)
    assert nd == 0, f"budgets shed {nd} instances at N={n}"

    def timed(k):
        t0 = time.time()
        float(run(scene, k))
        return time.time() - t0

    n_hi, n_lo = args.iters + 1, max(args.iters // 4, 1)
    pairs = []
    attempts = 0
    while len(pairs) < args.repeats and attempts < 4 * args.repeats:
        attempts += 1
        a, b = timed(n_hi), timed(n_lo)
        dt = (a - b) / (n_hi - n_lo)
        if dt <= 0:
            continue
        pairs.append(dt)
    dt = statistics.median(pairs)
    print(f"fwd+bwd at N={n}: {dt*1e3:.1f} ms/frame "
          f"(median of {len(pairs)} pairs, spread "
          f"{min(pairs)*1e3:.1f}-{max(pairs)*1e3:.1f} ms)", file=sys.stderr)

    artifact = dict(
        single_chip=dict(
            backend=jax.default_backend(),
            num_gaussians=n, width=w, height=h,
            budget=budget, kernel_budget=kb, num_windows=nw,
            window_params_mb=round((budget + 64) * 128 * 4 / 1e6, 1),
            num_dropped=nd,
            ms_per_frame_fwd_bwd=round(dt * 1e3, 2),
            ms_spread=[round(min(pairs) * 1e3, 2),
                       round(max(pairs) * 1e3, 2)],
            note="full differentiable render (projection + binning + "
                 "Pallas blend fwd+bwd) executed on ONE real chip at "
                 "N=2M — the blend-at-scale execution VERDICT r4 "
                 "missing #2 asked for; num_dropped==0 means no instance "
                 "was shed. Reference analogue: gaussians_selection.js "
                 "ships the whole buffer to its single worker.",
        ),
    )
    prev = {}
    if _os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
    prev.update(artifact)
    with open(args.out, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
