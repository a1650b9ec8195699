"""GaussianScene: the canonical parameter pytree for a splat scene.

Storage follows the raw-PLY convention of the reference ecosystem
(gaussians_selection.js:491-579, deep_learning_segmentation.py:25-40):

- ``means``      [N, 3]      world-space centers (``x, y, z``)
- ``log_scales`` [N, 3]      per-axis log scale (activated with ``exp``,
                             js:536-542 applies ``Math.exp`` at parse time)
- ``quats``      [N, 4]      rotation quaternion ``(w, x, y, z)``, stored
                             unnormalized; normalized on use (js:549-554)
- ``opacities``  [N]         pre-sigmoid logit (js:576 applies sigmoid)
- ``sh``         [N, K, 3]   spherical-harmonic color coefficients; ``K=1``
                             is the DC band (``f_dc_*``, js:566-569 maps it to
                             color via ``0.5 + SH_C0 * f_dc``); K in {1,4,9,16}
- ``labels``     [N] int32   per-gaussian segmentation label; ``NO_SELECTION``
                             when absent (js:579, js:6)

All trainable fields are leaves of a JAX pytree, so the scene passes directly
through jit/grad/shard_map. ``labels`` rides along as an int leaf (not
differentiated).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from gsplat_tpu.config import NO_SELECTION, SH_C0


def sh_degree_to_bands(degree: int) -> int:
    return (degree + 1) ** 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianScene:
    means: jax.Array        # [N, 3] f32
    log_scales: jax.Array   # [N, 3] f32
    quats: jax.Array        # [N, 4] f32, (w, x, y, z)
    opacities: jax.Array    # [N] f32 logits
    sh: jax.Array           # [N, K, 3] f32
    labels: jax.Array       # [N] i32

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return int(round(self.sh.shape[1] ** 0.5)) - 1

    def with_labels(self, labels) -> "GaussianScene":
        return dataclasses.replace(self, labels=labels)

    @classmethod
    def create(
        cls,
        means,
        log_scales,
        quats,
        opacities,
        sh,
        labels: Optional[np.ndarray] = None,
    ) -> "GaussianScene":
        n = np.asarray(means).shape[0]
        if labels is None:
            labels = np.full((n,), NO_SELECTION, dtype=np.int32)
        f32 = lambda a: np.asarray(a, dtype=np.float32)
        return cls(
            means=f32(means),
            log_scales=f32(log_scales),
            quats=f32(quats),
            opacities=f32(opacities).reshape(n),
            sh=f32(sh).reshape(n, -1, 3),
            labels=np.asarray(labels, dtype=np.int32).reshape(n),
        )

    def to_numpy(self) -> "GaussianScene":
        return GaussianScene(*(np.asarray(l) for l in (
            self.means, self.log_scales, self.quats, self.opacities,
            self.sh, self.labels)))


def dc_color(sh_dc: np.ndarray) -> np.ndarray:
    """DC-band SH -> linear RGB in [0, inf) (reference js:566-569 clamps to u8)."""
    return 0.5 + SH_C0 * sh_dc


def color_to_dc(rgb: np.ndarray) -> np.ndarray:
    return (np.asarray(rgb) - 0.5) / SH_C0
