"""Sharded rendering + training over a device mesh (8 virtual CPU devices).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python examples/05_multichip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gsplat_tpu.config import DEFAULT  # noqa: E402
from gsplat_tpu.io.cameras import look_at_camera  # noqa: E402
from gsplat_tpu.io.synthetic import sphere_scene  # noqa: E402
from gsplat_tpu.models import trainer  # noqa: E402
from gsplat_tpu.parallel import mesh as mesh_lib  # noqa: E402
from gsplat_tpu.parallel.render_sharded import render_sharded  # noqa: E402
from gsplat_tpu.render.api import render  # noqa: E402
from gsplat_tpu.render.projection import CameraParams  # noqa: E402

n_dev = jax.device_count()
mesh = mesh_lib.make_mesh((2, n_dev // 2) if n_dev % 2 == 0 else (1, n_dev))
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

scene = sphere_scene(2048, radius=1.0, seed=0)
sharded = mesh_lib.shard_scene(scene, mesh)
cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=128, height=96)

img = render_sharded(
    sharded, CameraParams.from_camera(cam), mesh, width=128, height=96,
    cfg=DEFAULT, budget_per_device=8192, interpret=True)
ref = render(scene, cam, DEFAULT)["image"]
err = float(np.abs(np.asarray(img)[:96] - np.asarray(ref)).max())
print(f"sharded vs single-device max pixel err: {err:.2e}")

step = trainer.make_train_step(
    (128, 96), DEFAULT, lr=1e-3, budget=8192, mesh=mesh,
    budget_per_device=8192, interpret=True)
state = trainer.init_state(sharded)
target = jnp.zeros((96, 128, 3))
state, loss, _ = step(state, sharded.labels, CameraParams.from_camera(cam),
                   target, jnp.zeros(3))
print(f"one sharded train step: loss {float(loss):.6f} "
      f"(grads reduce-scattered over the mesh)")
