"""Offline renderer CLI — the batch analogue of the reference's WebGL viewer
loop (gaussians_selection.js:1436-1640): renders PNG frames (and optional
label maps) of a gaussian PLY from cameras.json views, with the per-label
edits the viewer applies interactively (session JSON from
gsplat_tpu.interact.edit.EditState)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply_file", required=True)
    ap.add_argument("--camera_file", default=None,
                    help="cameras.json; default: an 8-view synthetic orbit")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--views", default=None,
                    help="comma-separated camera ids (default: all)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="resolution scale factor on camera intrinsics")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--label_maps", action="store_true")
    ap.add_argument("--session", default=None,
                    help="EditState session JSON to apply before rendering")
    ap.add_argument("--background", default="0,0,0")
    ap.add_argument("--budget", type=int, default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.config import DEFAULT, UNLABELED
    from gsplat_tpu.interact.edit import EditState, apply_edits
    from gsplat_tpu.io import ply
    from gsplat_tpu.io.cameras import load_cameras, orbit_cameras
    from gsplat_tpu.label.adapters import save_visualization
    from gsplat_tpu.render.api import render

    os.makedirs(args.out_dir, exist_ok=True)
    scene = ply.scene_from_ply(args.ply_file)
    if args.session:
        scene = apply_edits(scene, EditState.load(args.session))

    if args.camera_file:
        cameras = load_cameras(args.camera_file)
    else:
        extent = float(np.abs(scene.to_numpy().means).max())
        cameras = orbit_cameras(8, radius=3.0 * extent)
    if args.views:
        wanted = {int(v) for v in args.views.split(",")}
        cameras = [c for c in cameras if c.id in wanted]
    bg = jnp.asarray([float(x) for x in args.background.split(",")],
                     jnp.float32)

    for cam in cameras:
        if args.width and args.height:
            cam = cam.resized(args.width, args.height)
        elif args.scale != 1.0:
            cam = cam.resized(max(int(cam.width * args.scale), 1),
                              max(int(cam.height * args.scale), 1))
        out = render(scene, cam, DEFAULT, background=bg,
                     with_labels=args.label_maps, budget=args.budget)
        img = np.clip(np.asarray(out["image"]), 0.0, 1.0)
        path = os.path.join(args.out_dir, f"{cam.img_name}_{cam.id:04d}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        msg = f"rendered {path}"
        if args.label_maps:
            lm = np.asarray(out["label_map"])
            np.save(path.replace(".png", "_labels.npy"), lm)
            save_visualization(
                path.replace(".png", "_labels.png"),
                (img * 255).astype(np.uint8), lm,
                num_classes=max(int(lm.max()) + 1, 2))
            msg += f" (+labels, {len(np.unique(lm[lm != UNLABELED]))} classes)"
        print(msg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
