"""Benchmark: majority-vote labeling throughput vs the reference's loop.

The reference's dominant batch workload is the O(cameras x gaussians)
pure-Python vote loop (deep_learning_segmentation.py:241-308): for ~1e6
gaussians x 311 views that is ~3e8 interpreter iterations. This measures the
TPU-native jitted scan (gsplat_tpu/label/vote.py) on the same shape of
problem, plus a transliterated NumPy-vectorized version of the reference's
per-view body as the strongest honest CPU baseline (the real reference is
pure-Python dicts, orders of magnitude slower still).

Prints one JSON line: gaussian-view visibility/vote tests per second.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-gaussians", type=int, default=1_000_000)
    ap.add_argument("--num-views", type=int, default=311)
    ap.add_argument("--seg-size", type=int, default=256,
                    help="segmentation map resolution (square)")
    ap.add_argument("--num-classes", type=int, default=151)
    ap.add_argument("--mode", default="center",
                    choices=["center", "visible"],
                    help="center = reference-semantics projection vote; "
                         "visible = occlusion-aware (renders every view)")
    ap.add_argument("--render-size", type=int, default=512,
                    help="render resolution for --mode visible")
    ap.add_argument("--cpu-baseline", action="store_true",
                    help="also time the NumPy transliteration of the "
                         "reference loop (slow)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsplat_tpu.io.cameras import orbit_cameras
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.label.vote import (assign_labels, assign_labels_visible,
                                       camera_batch)

    rng = np.random.default_rng(0)
    scene = random_scene(args.num_gaussians, seed=0, extent=1.0)
    view_size = (args.render_size if args.mode == "visible"
                 else args.seg_size)
    cameras = [c.resized(view_size, view_size)
               for c in orbit_cameras(args.num_views, radius=3.0)]
    seg_maps = rng.integers(
        -1, args.num_classes - 1,
        size=(args.num_views, args.seg_size, args.seg_size)).astype(np.int32)

    def run():
        if args.mode == "visible":
            return assign_labels_visible(scene, cameras, seg_maps,
                                         num_classes=args.num_classes)
        return assign_labels(scene, cameras, seg_maps,
                             num_classes=args.num_classes)

    # warm/compile
    np.asarray(run())

    t0 = time.time()
    labels_np = np.asarray(run())
    dt = time.time() - t0
    pairs = args.num_gaussians * args.num_views
    rate = pairs / dt
    lab_frac = float((labels_np != -1).mean())
    print(f"TPU vote ({args.mode}): {dt:.3f}s for {args.num_views} views x "
          f"{args.num_gaussians} gaussians ({rate/1e9:.2f} G pair-votes/s, "
          f"labeled {lab_frac:.1%})", file=sys.stderr)

    if args.cpu_baseline:
        means = np.asarray(scene.means)
        t0 = time.time()
        votes = np.zeros((args.num_gaussians, args.num_classes + 1), np.int32)
        for vi, cam in enumerate(cameras):
            r = cam.rotation.astype(np.float64)
            t = -r @ cam.position
            pc = means @ r.T + t
            z = pc[:, 2]
            vis = z > 0
            zs = np.where(vis, z, 1.0)
            u = cam.fx * pc[:, 0] / zs + cam.width / 2.0
            v = cam.fy * pc[:, 1] / zs + cam.height / 2.0
            vis &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
            ui = np.clip(u.astype(np.int64), 0, args.seg_size - 1)
            vi_ = np.clip(v.astype(np.int64), 0, args.seg_size - 1)
            lab = seg_maps[vi][vi_, ui] + 1
            np.add.at(votes, (np.arange(args.num_gaussians),
                              np.where(vis, lab, 0)), vis.astype(np.int32))
        cpu_dt = time.time() - t0
        print(f"CPU vectorized-reference baseline: {cpu_dt:.3f}s "
              f"({pairs/cpu_dt/1e9:.3f} G pair-votes/s) -> TPU speedup "
              f"{cpu_dt/dt:.1f}x", file=sys.stderr)

    print(json.dumps({
        "metric": f"majority-vote labeling pair-votes/s ({args.mode}, "
                  f"{args.num_gaussians} gaussians, {args.num_views} views)",
        "value": round(rate / 1e9, 3),
        "unit": "G pair-votes/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
