"""Synthetic scene generators (test fixtures).

The reference's only synthetic-data backend is a parametric sphere PLY writer
(region_growing.py:42-76); we generalize to labeled random gaussian clouds and
gaussian-covered spheres for kernel parity / gradient tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gsplat_tpu.scene import GaussianScene, color_to_dc


def random_scene(
    n: int,
    *,
    seed: int = 0,
    extent: float = 1.0,
    scale_range: Sequence[float] = (0.01, 0.1),
    num_labels: Optional[int] = None,
    sh_degree: int = 0,
) -> GaussianScene:
    """Random gaussian cloud in a cube of half-width ``extent``."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, size=(n, 3))
    log_scales = np.log(rng.uniform(*scale_range, size=(n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = rng.uniform(-2.0, 4.0, size=(n,))  # sigmoid in ~[0.12, 0.98]
    k = (sh_degree + 1) ** 2
    sh = np.zeros((n, k, 3))
    sh[:, 0, :] = color_to_dc(rng.uniform(0.0, 1.0, size=(n, 3)))
    if k > 1:
        sh[:, 1:, :] = 0.1 * rng.normal(size=(n, k - 1, 3))
    labels = (rng.integers(0, num_labels, size=(n,)).astype(np.int32)
              if num_labels else None)
    return GaussianScene.create(means, log_scales, quats, opacities, sh, labels)


def sphere_scene(
    n: int,
    *,
    radius: float = 1.0,
    seed: int = 0,
    scale: float = 0.05,
    noise: float = 0.0,
) -> GaussianScene:
    """Gaussians on a sphere surface (analogue of region_growing.py:42-76).

    Colors encode the surface normal (useful for normal-estimation tests);
    labels split the sphere into octants.
    """
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    means = radius * d + noise * rng.normal(size=(n, 3))
    log_scales = np.full((n, 3), np.log(scale))
    quats = np.zeros((n, 4))
    quats[:, 0] = 1.0
    opacities = np.full((n,), 2.0)
    sh = color_to_dc(0.5 * (d + 1.0))[:, None, :]
    labels = ((d[:, 0] > 0).astype(np.int32) * 4
              + (d[:, 1] > 0).astype(np.int32) * 2
              + (d[:, 2] > 0).astype(np.int32)).astype(np.int32)
    return GaussianScene.create(means, log_scales, quats, opacities, sh, labels)


def grid_scene(side: int, *, spacing: float = 0.2, scale: float = 0.05,
               opacity: float = 2.0) -> GaussianScene:
    """Deterministic axis-aligned grid of isotropic gaussians (debug fixture)."""
    ax = (np.arange(side) - (side - 1) / 2) * spacing
    means = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    n = means.shape[0]
    quats = np.zeros((n, 4))
    quats[:, 0] = 1.0
    colors = (means / (np.abs(means).max() + 1e-9) + 1.0) / 2.0
    return GaussianScene.create(
        means, np.full((n, 3), np.log(scale)), quats,
        np.full((n,), opacity), color_to_dc(colors)[:, None, :],
        np.arange(n, dtype=np.int32))
