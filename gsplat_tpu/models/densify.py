"""Adaptive density control (densify + prune), TPU-native static shapes.

The original 3DGS training loop grows the gaussian set where the image
gradient says detail is missing (clone small under-reconstructed splats,
split large over-reconstructed ones) and prunes transparent splats. The
reference has no training at all, so this follows the 3DGS recipe, re-cast
for XLA: the scene lives in a FIXED-capacity buffer; "dead" slots carry an
opacity logit of ``DEAD_LOGIT`` (sigmoid ~ 0 < alpha_min, so projection
culls them — they cost only N-scale arithmetic, never blend compute, see
gsplat_tpu/render/projection.py opacity cull). Every densify step is a
static-shape program: candidates are ranked, matched to free slots by
sort-position, and written with one scatter — no dynamic reshapes, so one
compiled program serves the whole training run.

Deviation from the CUDA 3DGS heuristic: the densification signal is the
accumulated WORLD-space mean-gradient norm scaled by depth-free units
(grad_means), not the screen-space positional gradient — equivalent
ranking signal, no extra residuals through the kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import NO_SELECTION
from gsplat_tpu.models.trainer import SceneParams

DEAD_LOGIT = -15.0  # sigmoid(-15) ~ 3e-7 << alpha_min: projection culls


class DensifyConfig(NamedTuple):
    grad_threshold: float = 2e-4     # mean accumulated grad norm to densify
    percent_dense: float = 0.01      # split if scale > this * scene_extent
    split_factor: float = 1.6        # scale shrink for split children
    prune_opacity: float = 0.005     # kill below this sigmoid opacity
    prune_scale: float = 0.1         # kill above this * scene_extent
    max_new_fraction: float = 0.5    # cap new splats per step (of capacity)


class DensifyStats(NamedTuple):
    """Accumulated between densify steps (reset after each)."""

    grad_accum: jax.Array   # [C] sum of ||dL/dmean|| over steps
    count: jax.Array        # [C] number of steps the gaussian was visible

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        return cls(jnp.zeros((capacity,), jnp.float32),
                   jnp.zeros((capacity,), jnp.float32))

    def update(self, grads: SceneParams) -> "DensifyStats":
        g = jnp.linalg.norm(grads.means, axis=-1)
        seen = (g > 0.0).astype(jnp.float32)
        return DensifyStats(self.grad_accum + g, self.count + seen)


def pad_to_capacity(params: SceneParams, labels: jax.Array, capacity: int
                    ) -> Tuple[SceneParams, jax.Array]:
    """Grow the scene buffers to ``capacity`` with dead slots."""
    n = params.means.shape[0]
    extra = capacity - n
    if extra < 0:
        raise ValueError(f"capacity {capacity} < current {n}")
    if extra == 0:
        return params, labels
    pad = lambda a, fill: jnp.concatenate(
        [a, jnp.full((extra,) + a.shape[1:], fill, a.dtype)], axis=0)
    out = SceneParams(
        means=pad(params.means, 0.0),
        log_scales=pad(params.log_scales, 0.0),
        quats=pad(params.quats, 1.0).at[n:, 1:].set(0.0),
        opacities=pad(params.opacities, DEAD_LOGIT),
        sh=pad(params.sh, 0.0),
    )
    return out, pad(labels, NO_SELECTION)


def num_alive(params: SceneParams) -> jax.Array:
    return jnp.sum((params.opacities > DEAD_LOGIT + 1.0).astype(jnp.int32))


def densify_and_prune(
    params: SceneParams,
    labels: jax.Array,
    stats: DensifyStats,
    key: jax.Array,
    scene_extent: float,
    cfg: DensifyConfig = DensifyConfig(),
) -> Tuple[SceneParams, jax.Array, DensifyStats, jax.Array]:
    """One adaptive-density step over the fixed-capacity buffers.

    Prunes transparent/oversized splats, then fills dead slots with clones
    (small, high-grad) and splits (large, high-grad; parent's scale shrinks
    and both samples draw from the parent's distribution). Returns updated
    (params, labels, zeroed stats, rewritten-slot mask). Fully jittable;
    shapes never change. The mask marks slots whose occupant changed
    (pruned or newly written): the caller must zero the optimizer moments
    at those rows (``trainer.zero_adam_rows``) so fresh splats do not
    inherit the pruned previous occupant's Adam state — matching the CUDA
    3DGS behavior of rebuilding optimizer state on every densify step.
    """
    c = params.means.shape[0]
    opac = jax.nn.sigmoid(params.opacities)
    scales = jnp.exp(params.log_scales)
    max_scale = jnp.max(scales, axis=-1)
    alive = params.opacities > DEAD_LOGIT + 1.0

    # ---- prune
    keep = alive & (opac >= cfg.prune_opacity) & (
        max_scale <= cfg.prune_scale * scene_extent)
    opacities = jnp.where(keep, params.opacities, DEAD_LOGIT)

    # ---- densification candidates
    g_avg = stats.grad_accum / jnp.maximum(stats.count, 1.0)
    hot = keep & (g_avg > cfg.grad_threshold)
    big = max_scale > cfg.percent_dense * scene_extent
    want_split = hot & big
    want_clone = hot & ~big

    # ---- match candidates to dead slots by sort position: the i-th best
    # candidate writes the i-th free slot (static shapes; excess candidates
    # beyond the free-slot budget are dropped by priority).
    max_new = int(cfg.max_new_fraction * c)
    priority = jnp.where(hot & keep, g_avg, -jnp.inf)
    cand = jnp.argsort(-priority)                     # best first
    free = jnp.argsort(keep.astype(jnp.int32))        # dead slots first
    n_free = jnp.sum(~keep)
    n_cand = jnp.sum(want_split | want_clone)
    n_new = jnp.minimum(jnp.minimum(n_free, n_cand), max_new)
    i = jnp.arange(c)
    take = i < n_new
    src = cand                                        # [C] candidate per rank
    dst = jnp.where(take, free[jnp.minimum(i, c - 1)], c)  # drop beyond n_new

    # child parameters: clones copy the parent; splits sample from the
    # parent's gaussian and shrink scales (parent also shrinks, per 3DGS)
    rot = _quat_rotmats(params.quats[src])
    eps = jax.random.normal(key, (c, 3))
    offset = jnp.einsum("nij,nj->ni", rot, eps * jnp.exp(
        params.log_scales[src]))
    is_split = want_split[src]
    child_means = jnp.where(is_split[:, None],
                            params.means[src] + offset, params.means[src])
    child_logs = jnp.where(
        is_split[:, None],
        params.log_scales[src] - jnp.log(cfg.split_factor),
        params.log_scales[src])

    means = params.means.at[dst].set(child_means, mode="drop")
    log_scales = params.log_scales.at[dst].set(child_logs, mode="drop")
    quats = params.quats.at[dst].set(params.quats[src], mode="drop")
    sh = params.sh.at[dst].set(params.sh[src], mode="drop")
    opacities = opacities.at[dst].set(opacities[src], mode="drop")
    new_labels = labels.at[dst].set(labels[src], mode="drop")

    # split parents shrink in place (their mass is now shared with the child)
    parent_split = want_split & keep
    log_scales = jnp.where(parent_split[:, None],
                           log_scales - jnp.log(cfg.split_factor), log_scales)

    out = SceneParams(means=means, log_scales=log_scales, quats=quats,
                      opacities=opacities, sh=sh)
    written = jnp.zeros((c,), bool).at[dst].set(take, mode="drop") | ~keep
    return out, new_labels, DensifyStats.zeros(c), written


def reset_opacities(params: SceneParams, value: float = 0.01
                    ) -> Tuple[SceneParams, jax.Array]:
    """Periodic opacity reset (3DGS: clamp alive opacities down so pruning
    can reconsider them). Returns (params, changed mask); the caller should
    zero the opacity Adam moments at changed rows
    (``trainer.zero_adam_rows(..., fields=("opacities",))``) like the CUDA
    implementation's ``reset_opacity`` optimizer-state replacement."""
    alive = params.opacities > DEAD_LOGIT + 1.0
    logit = float(jnp.log(value / (1.0 - value)))
    changed = alive & (params.opacities > logit)
    new = jnp.where(alive, jnp.minimum(params.opacities, logit),
                    params.opacities)
    return params._replace(opacities=new), changed


def _quat_rotmats(quats: jax.Array) -> jax.Array:
    from gsplat_tpu.render.projection import quat_to_rotmat
    return quat_to_rotmat(quats)
