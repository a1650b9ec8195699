"""Device mesh construction + sharding rules.

TPU-native replacement for the reference's Web Worker postMessage protocol
(SURVEY.md section 2.24, gaussians_selection.js:602-658): communication is
expressed as XLA collectives over a ``Mesh(('host', 'chip'))`` — 'host' maps
to DCN (inter-host), 'chip' to ICI (intra-host). Sharding rules:

- gaussian arrays:   P(('host', 'chip'))   — gaussians split over all devices
- image tiles:       P(('host', 'chip'))   — each device owns a 2D-interleaved tile lattice
- cameras / scalars: replicated
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_HOST = "host"
AXIS_CHIP = "chip"
AXES = (AXIS_HOST, AXIS_CHIP)


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (host, chip) mesh. Default: all devices as (1, n) or, when
    running multi-process, (num_processes, devices_per_process)."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        n_proc = jax.process_count()
        if n_proc > 1 and len(devices) % n_proc == 0:
            shape = (n_proc, len(devices) // n_proc)
        else:
            shape = (1, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


def gaussian_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (gaussian) axis over every device."""
    return NamedSharding(mesh, P(AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_scene(scene, mesh: Mesh):
    """Place a GaussianScene with gaussians sharded over all devices.

    Pads N up to a multiple of the device count (padding gaussians get
    opacity logit -30 => sigmoid ~ 0, so they never contribute).
    """
    import jax.numpy as jnp

    from gsplat_tpu.scene import GaussianScene

    n = scene.num_gaussians
    d = mesh.devices.size
    n_pad = (-(-n // d)) * d
    pad = n_pad - n

    def pad_leaf(x, fill=0.0):
        if pad == 0:
            return jnp.asarray(x)
        widths = [(0, pad)] + [(0, 0)] * (np.ndim(x) - 1)
        return jnp.pad(jnp.asarray(x), widths, constant_values=fill)

    padded = GaussianScene(
        means=pad_leaf(scene.means),
        log_scales=pad_leaf(scene.log_scales),
        quats=pad_leaf(scene.quats, 1.0),  # w=1 in col 0 irrelevant; any quat
        opacities=pad_leaf(scene.opacities, -30.0),
        sh=pad_leaf(scene.sh),
        labels=pad_leaf(scene.labels, 0),
    )
    gs = gaussian_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, gs), padded)
