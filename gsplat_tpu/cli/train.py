"""Differentiable scene optimization CLI — the training capability the
reference lacks (its render path is forward-only GLSL): fit gaussian
parameters to target images through the Pallas backward kernels.

    python -m gsplat_tpu.cli.train --camera_file cameras.json \
        --image_dir images/ --out scene.ply --iters 500
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--camera_file", required=True)
    ap.add_argument("--image_dir", required=True,
                    help="target images named {img_name}.png")
    ap.add_argument("--out", required=True, help="output PLY")
    ap.add_argument("--init_ply", default=None)
    ap.add_argument("--num_gaussians", type=int, default=20000,
                    help="random-init size when --init_ply is absent")
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--scale", type=float, default=0.25,
                    help="resolution scale on camera intrinsics")
    ap.add_argument("--budget_factor", type=float, default=8.0)
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--checkpoint_every", type=int, default=100)
    ap.add_argument("--log_every", type=int, default=20)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.config import DEFAULT
    from gsplat_tpu.io import ply
    from gsplat_tpu.io.cameras import load_cameras
    from gsplat_tpu.io.synthetic import random_scene
    from gsplat_tpu.models import trainer
    from gsplat_tpu.render.projection import CameraParams
    from gsplat_tpu.render.tiles import instance_budget
    from gsplat_tpu.utils import checkpoint as ckpt

    cameras = []
    targets = []
    for cam in load_cameras(args.camera_file):
        p = os.path.join(args.image_dir, cam.img_name + ".png")
        if not os.path.exists(p):
            print(f"warning: missing target image {p}", file=sys.stderr)
            continue
        cam = cam.resized(max(int(cam.width * args.scale), 16),
                          max(int(cam.height * args.scale), 16))
        img = np.asarray(
            Image.open(p).convert("RGB").resize((cam.width, cam.height)),
            dtype=np.float32) / 255.0
        cameras.append(cam)
        targets.append(img)
    if not cameras:
        print("error: no (camera, image) pairs found", file=sys.stderr)
        return 1
    print(f"{len(cameras)} training views at "
          f"{cameras[0].width}x{cameras[0].height}")

    if args.init_ply:
        scene = ply.scene_from_ply(args.init_ply)
    else:
        # init inside the cameras' joint view volume
        centers = np.stack([c.position for c in cameras])
        extent = float(np.abs(centers).max()) or 1.0
        scene = random_scene(args.num_gaussians, seed=0, extent=extent * 0.5,
                             scale_range=(0.01 * extent, 0.05 * extent))
    print(f"{scene.num_gaussians} gaussians")

    w, h = cameras[0].width, cameras[0].height
    budget = instance_budget(scene.num_gaussians, DEFAULT.tiles.chunk,
                             args.budget_factor)
    step = trainer.make_train_step((w, h), DEFAULT, lr=args.lr, budget=budget)
    state = trainer.init_state(scene, lr=args.lr)
    start = 0
    if args.checkpoint_dir and os.path.exists(
            os.path.join(args.checkpoint_dir, "state")):
        state = ckpt.restore_pytree(
            os.path.join(args.checkpoint_dir, "state"), like=state)
        start = int(state.step)
        print(f"resumed at step {start}")

    cams_j = [CameraParams.from_camera(c) for c in cameras]
    tgts_j = [jnp.asarray(t) for t in targets]
    bg = jnp.zeros(3, jnp.float32)
    labels = jnp.asarray(scene.labels)
    for it in range(start, args.iters):
        v = it % len(cameras)
        state, loss = step(state, labels, cams_j[v], tgts_j[v], bg)
        if it % args.log_every == 0 or it == args.iters - 1:
            print(f"step {it}: loss {float(loss):.6f}")
        if (args.checkpoint_dir and it > start
                and it % args.checkpoint_every == 0):
            ckpt.save_pytree(os.path.join(args.checkpoint_dir, "state"),
                             state)

    final = state.params.to_scene(labels)
    ply.scene_to_ply(args.out, final)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
