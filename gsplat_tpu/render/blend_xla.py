"""Dense jnp compositing (no tiles): differentiable fallback + grad reference.

Evaluates every (pixel, gaussian) pair — O(H*W*N) memory — so it is only for
small scenes/tests, as the autodiff twin that the Pallas custom-VJP kernels
must match on both pixels and gradients. Front-to-back "under" compositing
is expressed as an exclusive cumulative product over the depth-sorted
gaussian axis:  C_p = sum_i [prod_{j<i}(1-a_j)] a_i c_i  (the closed form of
the sequential loop in gaussians_selection.js:1033-1038 / ref/rasterizer.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterConfig, UNLABELED
from gsplat_tpu.render.projection import Projected


def pixel_alphas(
    means2d: jax.Array,   # [N, 2]
    conic: jax.Array,     # [N, 3]
    opacity: jax.Array,   # [N]
    valid: jax.Array,     # [N] bool
    px: jax.Array,        # [P] pixel-center x
    py: jax.Array,        # [P] pixel-center y
    cfg: RasterConfig,
) -> jax.Array:
    """[P, N] per-pixel alphas with the alpha_min/alpha_max semantics."""
    dx = px[:, None] - means2d[None, :, 0]
    dy = py[:, None] - means2d[None, :, 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    q = a[None] * dx * dx + 2 * b[None] * dx * dy + c[None] * dy * dy
    alpha = opacity[None, :] * jnp.exp(-0.5 * q)
    alpha = jnp.minimum(alpha, cfg.alpha_max)
    keep = (alpha >= cfg.alpha_min) & valid[None, :]
    return jnp.where(keep, alpha, 0.0)


def blend_dense(
    proj: Projected,
    order: jax.Array,       # [N] depth-sorted indices
    width: int,
    height: int,
    cfg: RasterConfig,
    labels: Optional[jax.Array] = None,
    background: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    gx, gy = jnp.meshgrid(px, py)  # [H, W]
    pxf, pyf = gx.reshape(-1), gy.reshape(-1)

    m2d = proj.means2d[order]
    con = proj.conic[order]
    opa = proj.opacity[order]
    col = proj.color[order]
    val = proj.valid[order]

    alpha = pixel_alphas(m2d, con, opa, val, pxf, pyf, cfg)  # [P, N]
    one_minus = 1.0 - alpha
    t_incl = jnp.cumprod(one_minus, axis=1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1)
    w = t_excl * alpha                                        # [P, N]
    img = w @ col                                             # [P, 3]
    t_final = t_incl[:, -1]

    if background is None:
        background = jnp.asarray(cfg.background, jnp.float32)
    img = img + t_final[:, None] * background[None, :]

    out = dict(
        image=img.reshape(height, width, 3),
        alpha=(1.0 - t_final).reshape(height, width),
        transmittance=t_final.reshape(height, width),
    )
    if labels is not None:
        lab = labels[order]
        best = jnp.argmax(w, axis=1)
        hit = jnp.take_along_axis(w, best[:, None], axis=1)[:, 0] > 0
        label_map = jnp.where(hit, lab[best], UNLABELED)
        out["label_map"] = label_map.reshape(height, width)
    return out
