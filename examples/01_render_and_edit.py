"""Render, select, and edit a labeled scene (the viewer workflow, scripted).

Run: JAX_PLATFORMS=cpu python examples/01_render_and_edit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from gsplat_tpu.config import DEFAULT
from gsplat_tpu.interact.edit import EditState, apply_edits, hit_test
from gsplat_tpu.io import ply
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.splat_format import write_splat
from gsplat_tpu.io.synthetic import sphere_scene
from gsplat_tpu.render.api import render

scene = sphere_scene(3000, radius=1.0, seed=0)  # labels = octants
cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=320, height=240)

out = render(scene, cam, DEFAULT, with_labels=True)
print("rendered", out["image"].shape, "coverage",
      float(np.asarray(out["alpha"]).mean()))

# click the image center -> which label is there?
label = hit_test(scene, cam, 160, 120)
print("hit label:", label)

# hide it, displace another label, recolor a third
edits = (EditState()
         .toggle_visibility(label)
         .displace(1, (0.0, 0.4, 0.0))
         .set_color(2, (1.0, 0.0, 0.0)))
out2 = render(apply_edits(scene, edits), cam, DEFAULT, with_labels=True)
gone = int((np.asarray(out2["label_map"]) == label).sum())
print(f"after hide: {gone} pixels of label {label} remain")

# persist artifacts: labeled PLY + viewer-compatible .splat + session
ply.scene_to_ply("/tmp/example_scene.ply", scene)
write_splat("/tmp/example_scene.splat", scene)
edits.save("/tmp/example_session.json")
print("wrote /tmp/example_scene.{ply,splat} and session json")
