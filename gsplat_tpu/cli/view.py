"""Live viewer CLI: serve a gaussian PLY for interactive orbit / selection /
per-label editing in the browser (TPU renders, browser displays).

    python -m gsplat_tpu.cli.view --ply_file scene.ply --port 8000
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ply_file", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--session", default=None,
                    help="JSON file persisting edits across runs")
    args = ap.parse_args(argv)

    from gsplat_tpu.interact.viewer import ViewerServer
    from gsplat_tpu.io import ply

    scene = ply.scene_from_ply(args.ply_file)
    print(f"loaded {scene.num_gaussians} gaussians")
    server = ViewerServer(scene, width=args.width, height=args.height,
                          session_path=args.session)
    server.serve(args.host, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
