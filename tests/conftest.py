"""Test harness: force an 8-device virtual CPU platform for sharding tests.

Must set XLA flags before jax initializes (SURVEY.md section 4: multi-host
tests run without a pod via xla_force_host_platform_device_count).
"""

import os

# The harness exports JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize that registers the axon PJRT plugin at interpreter startup —
# before this file runs — so env vars alone are too late. Force the CPU
# platform via jax.config after import; XLA_FLAGS still applies because the
# CPU backend itself has not been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gsplat_tpu.io.cameras import look_at_camera  # noqa: E402
from gsplat_tpu.io.synthetic import random_scene  # noqa: E402


@pytest.fixture(scope="session")
def small_scene():
    return random_scene(200, seed=1, num_labels=5)


@pytest.fixture(scope="session")
def small_camera():
    return look_at_camera((0.0, 0.0, -3.0), (0.0, 0.0, 0.0),
                          width=64, height=48, fov_x_deg=60.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
