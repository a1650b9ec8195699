"""Live viewer CLI: serve a gaussian PLY for interactive orbit / selection /
per-label editing in the browser (TPU renders, browser displays).

    python -m gsplat_tpu.cli.view --ply_file scene.ply --port 8000
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply_file", required=True)
    ap.add_argument("--camera_file", default=None,
                    help="cameras.json enabling 0-9/+/- dataset-camera "
                         "navigation (gaussians_selection.js:1159-1171)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--session", default=None,
                    help="JSON file persisting edits across runs")
    args = ap.parse_args(argv)

    from gsplat_tpu.interact.viewer import ViewerServer
    from gsplat_tpu.io import ply
    from gsplat_tpu.io.cameras import load_cameras

    scene = ply.scene_from_ply(args.ply_file)
    print(f"loaded {scene.num_gaussians} gaussians")
    cameras = load_cameras(args.camera_file) if args.camera_file else None
    server = ViewerServer(scene, width=args.width, height=args.height,
                          session_path=args.session, cameras=cameras)
    print("prewarming frame program (compiles once; cached on disk) ...")
    server.prewarm()
    server.serve(args.host, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
