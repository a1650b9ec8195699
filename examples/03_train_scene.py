"""Differentiable scene fitting (capability the reference lacks): perturb a
scene, then recover it from rendered target images via the Pallas backward
kernels.

Run: JAX_PLATFORMS=cpu python examples/03_train_scene.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import dataclasses

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import DEFAULT
from gsplat_tpu.io.cameras import orbit_cameras
from gsplat_tpu.io.synthetic import sphere_scene
from gsplat_tpu.models import trainer
from gsplat_tpu.render.api import render
from gsplat_tpu.render.projection import CameraParams
from gsplat_tpu.render.tiles import instance_budget

scene = sphere_scene(500, radius=1.0, seed=0)
cams = orbit_cameras(4, radius=3.0, width=96, img_height=64)
targets = [jnp.asarray(render(scene, c, DEFAULT)["image"]) for c in cams]

rng = np.random.default_rng(0)
pert = dataclasses.replace(
    scene, means=scene.means + 0.07 * rng.normal(
        size=scene.means.shape).astype(np.float32))

budget = instance_budget(500, DEFAULT.tiles.chunk, 16.0)
step = trainer.make_train_step((96, 64), DEFAULT, lr=3e-3, budget=budget)
state = trainer.init_state(pert)
bg = jnp.zeros(3, jnp.float32)
for it in range(60):
    cam = CameraParams.from_camera(cams[it % 4])
    state, loss, _ = step(state, pert.labels, cam, targets[it % 4], bg)
    if it % 15 == 0 or it == 59:
        print(f"step {it:3d}  loss {float(loss):.6f}")
print("means error before:",
      float(np.abs(pert.means - scene.means).mean()),
      "after:",
      float(np.abs(np.asarray(state.params.means) - scene.means).mean()))
