"""Two-process distributed bootstrap smoke test (VERDICT r2 task #6).

Launches TWO actual Python processes that rendezvous through
``jax.distributed.initialize`` (via gsplat_tpu.parallel.bootstrap) on a
local coordinator, build the ('host', 'chip') mesh across both processes
(2 hosts x 2 virtual CPU chips each), shard a scene over it, and run one
sharded train step — proving the multi-process wiring end to end, not just
in prose. Reference analogue: the viewer's worker bootstrap
(gaussians_selection.js:864-871) is its only process boundary; ours is the
DCN coordinator handshake.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
rank = int(sys.argv[1])
port = sys.argv[2]
root = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, root)

import jax
from gsplat_tpu.parallel.bootstrap import initialize_distributed

initialize_distributed("127.0.0.1:" + port, 2, rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import jax.numpy as jnp
from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.models import trainer
from gsplat_tpu.parallel import mesh as mesh_lib
from gsplat_tpu.render.projection import CameraParams

mesh = mesh_lib.make_mesh()          # (2 processes, 2 chips each)
assert mesh.devices.shape == (2, 2), mesh.devices.shape

cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=64, height=64)
scene = random_scene(512, seed=0, extent=1.0, scale_range=(0.02, 0.1))
scene = mesh_lib.shard_scene(scene, mesh)
step = trainer.make_train_step(
    (cam.width, cam.height), Config(), lr=1e-3, budget=2048, mesh=mesh,
    budget_per_device=2048, interpret=True)
state = trainer.init_state(scene, lr=1e-3)
target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
bg = jnp.zeros(3, jnp.float32)
state, loss, _ = step(state, jnp.asarray(scene.labels),
                   CameraParams.from_camera(cam), target, bg)
print("RANK%d loss=%.8f" % (rank, float(loss)), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_train_step(tmp_path):
    # bounded by communicate(timeout=540) below (no pytest-timeout dep)
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port), ROOT],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=ROOT)
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err}"
    losses = []
    for rc, out, err in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RANK")]
        assert line, out
        losses.append(float(line[0].split("loss=")[1]))
    # the loss is a global replicated scalar: both processes must agree
    assert abs(losses[0] - losses[1]) < 1e-9, losses
