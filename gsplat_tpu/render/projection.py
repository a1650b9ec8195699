"""Differentiable gaussian projection (plain jnp; XLA fuses, autodiff derives VJP).

TPU-native equivalent of the reference's vertex-shader math
(gaussians_selection.js:696-739) and texture-pack covariance build
(js:330-349), batched over all gaussians: quat -> rotation -> Sigma3,
camera transform, perspective Jacobian, Sigma2 = (J W) Sigma3 (J W)^T + blur,
conic, 3.33-sigma radius, culling mask. Semantics defined by
gsplat_tpu/ref/rasterizer.py (the oracle); keep the two in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gsplat_tpu.config import RasterConfig
from gsplat_tpu.io.cameras import Camera
from gsplat_tpu.render.sh import eval_sh
from gsplat_tpu.scene import GaussianScene


class CameraParams(NamedTuple):
    """Traced camera parameters (static width/height live alongside)."""

    rot: jax.Array       # [3, 3] world-to-camera rotation
    pos: jax.Array       # [3] camera center (world)
    fx: jax.Array        # scalar
    fy: jax.Array        # scalar

    @classmethod
    def from_camera(cls, cam: Camera) -> "CameraParams":
        return cls(
            rot=jnp.asarray(cam.rotation, jnp.float32),
            pos=jnp.asarray(cam.position, jnp.float32),
            fx=jnp.asarray(cam.fx, jnp.float32),
            fy=jnp.asarray(cam.fy, jnp.float32),
        )


class Projected(NamedTuple):
    means2d: jax.Array   # [N, 2] pixel coords
    conic: jax.Array     # [N, 3] (a, b, c) of inverse 2D covariance
    depth: jax.Array     # [N] camera-space z
    radius: jax.Array    # [N] cutoff-sigma pixel radius (isotropic bound)
    extent: jax.Array    # [N, 2] per-axis half-extents of the cutoff ellipse
    qmax: jax.Array      # [N] Mahalanobis^2 at the alpha_min cutoff
    color: jax.Array     # [N, 3] SH-evaluated RGB (>= 0)
    opacity: jax.Array   # [N] sigmoid-activated
    valid: jax.Array     # [N] bool


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """[N, 4] (w, x, y, z) -> [N, 3, 3]."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def covariance_3d(log_scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Sigma3 = R diag(exp(2s)) R^T, [N, 3, 3]."""
    rot = quat_to_rotmat(quats)
    s2 = jnp.exp(2.0 * log_scales)
    return jnp.einsum("nij,nj,nkj->nik", rot, s2, rot,
                      precision=jax.lax.Precision.HIGHEST)


def project(
    scene: GaussianScene,
    cam: CameraParams,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
    *,
    z_near: float = 0.2,
    z_far: float = 200.0,
    sh_degree: int | None = None,
) -> Projected:
    """Project all gaussians into one camera (fully differentiable)."""
    means = scene.means
    hp = jax.lax.Precision.HIGHEST
    pc = (jnp.einsum("ni,ji->nj", means, cam.rot, precision=hp)
          + (-cam.rot @ cam.pos))  # [N, 3]
    z = pc[:, 2]
    valid = (z > z_near) & (z < z_far)
    zs = jnp.where(valid, z, 1.0)

    u = cam.fx * pc[:, 0] / zs + width / 2.0
    v = cam.fy * pc[:, 1] / zs + height / 2.0
    means2d = jnp.stack([u, v], axis=-1)

    sigma3 = covariance_3d(scene.log_scales, scene.quats)
    # T = J @ R_wc, with J the 2x3 perspective Jacobian; build rows directly.
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # row0 = fx/z * R0 - fx*x/z^2 * R2 ; row1 = fy/z * R1 - fy*y/z^2 * R2
    r0, r1, r2 = cam.rot[0], cam.rot[1], cam.rot[2]
    t0 = (cam.fx * inv_z)[:, None] * r0[None, :] \
        - (cam.fx * pc[:, 0] * inv_z2)[:, None] * r2[None, :]
    t1 = (cam.fy * inv_z)[:, None] * r1[None, :] \
        - (cam.fy * pc[:, 1] * inv_z2)[:, None] * r2[None, :]
    a = jnp.einsum("ni,nij,nj->n", t0, sigma3, t0, precision=hp) \
        + cfg.cov2d_blur
    b = jnp.einsum("ni,nij,nj->n", t0, sigma3, t1, precision=hp)
    c = jnp.einsum("ni,nij,nj->n", t1, sigma3, t1, precision=hp) \
        + cfg.cov2d_blur
    det = a * c - b * b
    valid &= det > 0
    det_safe = jnp.where(det > 0, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    opacity = jax.nn.sigmoid(scene.opacities)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.0))
    # Opacity-aware cutoff: alpha >= alpha_min is impossible beyond
    # sqrt(2 ln(opacity/alpha_min)) sigmas, so the bound is exact w.r.t. the
    # alpha_min masking semantics (the oracle's fixed 3.33-sigma box is a
    # superset). Low-opacity splats shrink; opacity < alpha_min culls.
    cutoff = jnp.sqrt(2.0 * jnp.log(
        jnp.maximum(opacity / cfg.alpha_min, 1.0)))
    cutoff = jnp.minimum(cutoff, cfg.sigma_cutoff)
    radius = cutoff * jnp.sqrt(jnp.maximum(lam1, 0.0))
    # Per-axis half-extents of the cutoff ellipse {q <= cutoff^2}: the
    # ellipse's max |dx| is cutoff*sqrt(Sigma2_xx) — strictly tighter than
    # the isotropic lam1 radius for anisotropic splats, so the tile bboxes
    # built from it enumerate fewer instances.
    extent = cutoff[:, None] * jnp.sqrt(jnp.maximum(
        jnp.stack([a, c], axis=-1), 0.0))
    qmax = cutoff * cutoff
    valid &= opacity >= cfg.alpha_min

    valid &= (u + extent[:, 0] > 0) & (u - extent[:, 0] < width)
    valid &= (v + extent[:, 1] > 0) & (v - extent[:, 1] < height)

    view_dir = means - cam.pos[None, :]
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-12)
    color = eval_sh(scene.sh, view_dir, degree=sh_degree)

    return Projected(means2d=means2d, conic=conic, depth=z, radius=radius,
                     extent=extent, qmax=qmax, color=color, opacity=opacity,
                     valid=valid)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    """(tiles_x, tiles_y) for an image."""
    return (-(-width // tile_size), -(-height // tile_size))
