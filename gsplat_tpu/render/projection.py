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
from gsplat_tpu.render.sh import eval_sh, eval_sh_soa
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
    """Projection outputs, STRUCTURE-OF-ARRAYS: every field is [N].

    r5 layout fix: elementwise ops on [N, 2]/[N, 3] arrays run ~13x below
    HBM speed on v5e (narrow minor dims vectorize onto 2-4 of 128 lanes —
    measured 82 GB/s vs 1103 GB/s effective, scripts/profile_proj_glue.py
    + /tmp layout probe). Materializing means2d/conic/extent/color as
    packed arrays cost ~1 ms/frame across projection and its consumers'
    re-slicing; flat [N] fields keep every producer and consumer at full
    lane occupancy."""

    u: jax.Array         # [N] pixel x
    v: jax.Array         # [N] pixel y
    ca: jax.Array        # [N] conic a (inverse 2D covariance)
    cb: jax.Array        # [N] conic b
    cc: jax.Array        # [N] conic c
    depth: jax.Array     # [N] camera-space z
    radius: jax.Array    # [N] cutoff-sigma pixel radius (isotropic bound)
    ex: jax.Array        # [N] cutoff-ellipse half-extent along x
    ey: jax.Array        # [N] cutoff-ellipse half-extent along y
    qmax: jax.Array      # [N] Mahalanobis^2 at the alpha_min cutoff
    red: jax.Array       # [N] SH-evaluated color (>= 0)
    green: jax.Array     # [N]
    blue: jax.Array      # [N]
    opacity: jax.Array   # [N] sigmoid-activated
    valid: jax.Array     # [N] bool

    # Packed views for oracle/test comparisons only — DO NOT use on the
    # render path (they reintroduce the slow narrow-minor layout).
    @property
    def means2d(self) -> jax.Array:
        return jnp.stack([self.u, self.v], axis=-1)

    @property
    def conic(self) -> jax.Array:
        return jnp.stack([self.ca, self.cb, self.cc], axis=-1)

    @property
    def extent(self) -> jax.Array:
        return jnp.stack([self.ex, self.ey], axis=-1)

    @property
    def color(self) -> jax.Array:
        return jnp.stack([self.red, self.green, self.blue], axis=-1)


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


def _sigma3_entries(log_scales: jax.Array, quats: jax.Array):
    """Unique entries of Sigma3 as six [N] arrays (s00,s01,s02,s11,s12,s22).

    Structure-of-arrays twin of :func:`covariance_3d`: [N,3,3] f32 arrays pad
    their minor dims to (8,128) TPU tiles and the batched dot_generals force
    them to materialize in HBM — measured ~2.2ms/frame at N=100k for the
    einsum path vs ~0.2ms for this all-elementwise form. Same math, same
    f32 FMA accumulation as precision=HIGHEST.
    """
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    e = jnp.exp(2.0 * log_scales)
    e0, e1, e2 = e[..., 0], e[..., 1], e[..., 2]
    s00 = r00 * e0 * r00 + r01 * e1 * r01 + r02 * e2 * r02
    s01 = r00 * e0 * r10 + r01 * e1 * r11 + r02 * e2 * r12
    s02 = r00 * e0 * r20 + r01 * e1 * r21 + r02 * e2 * r22
    s11 = r10 * e0 * r10 + r11 * e1 * r11 + r12 * e2 * r12
    s12 = r10 * e0 * r20 + r11 * e1 * r21 + r12 * e2 * r22
    s22 = r20 * e0 * r20 + r21 * e1 * r21 + r22 * e2 * r22
    return s00, s01, s02, s11, s12, s22


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
    # World->camera transform, structure-of-arrays: all [N]-shaped elementwise
    # chains (no [N,3]/[N,3,3] dot_generals — see _sigma3_entries docstring).
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    trans = -cam.rot @ cam.pos  # [3], O(1)
    R = cam.rot
    pcx = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + trans[0]
    pcy = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + trans[1]
    z = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + trans[2]
    valid = (z > z_near) & (z < z_far)
    zs = jnp.where(valid, z, 1.0)

    u = cam.fx * pcx / zs + width / 2.0
    v = cam.fy * pcy / zs + height / 2.0

    s00, s01, s02, s11, s12, s22 = _sigma3_entries(
        scene.log_scales, scene.quats)
    # T = J @ R_wc, with J the 2x3 perspective Jacobian; build rows directly.
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # row0 = fx/z * R0 - fx*x/z^2 * R2 ; row1 = fy/z * R1 - fy*y/z^2 * R2
    f0 = cam.fx * inv_z
    g0 = cam.fx * pcx * inv_z2
    f1 = cam.fy * inv_z
    g1 = cam.fy * pcy * inv_z2
    t00 = f0 * R[0, 0] - g0 * R[2, 0]
    t01 = f0 * R[0, 1] - g0 * R[2, 1]
    t02 = f0 * R[0, 2] - g0 * R[2, 2]
    t10 = f1 * R[1, 0] - g1 * R[2, 0]
    t11 = f1 * R[1, 1] - g1 * R[2, 1]
    t12 = f1 * R[1, 2] - g1 * R[2, 2]
    # Sigma3 @ t^T rows once, then the three bilinear forms share them.
    st00 = s00 * t00 + s01 * t01 + s02 * t02
    st01 = s01 * t00 + s11 * t01 + s12 * t02
    st02 = s02 * t00 + s12 * t01 + s22 * t02
    st10 = s00 * t10 + s01 * t11 + s02 * t12
    st11 = s01 * t10 + s11 * t11 + s12 * t12
    st12 = s02 * t10 + s12 * t11 + s22 * t12
    a = t00 * st00 + t01 * st01 + t02 * st02 + cfg.cov2d_blur
    b = t10 * st00 + t11 * st01 + t12 * st02
    c = t10 * st10 + t11 * st11 + t12 * st12 + cfg.cov2d_blur
    det = a * c - b * b
    valid &= det > 0
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    ca, cb, cc = c * inv_det, -b * inv_det, a * inv_det

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
    ex = cutoff * jnp.sqrt(jnp.maximum(a, 0.0))
    ey = cutoff * jnp.sqrt(jnp.maximum(c, 0.0))
    qmax = cutoff * cutoff
    valid &= opacity >= cfg.alpha_min

    valid &= (u + ex > 0) & (u - ex < width)
    valid &= (v + ey > 0) & (v - ey < height)

    red, green, blue = eval_sh_soa(
        scene.sh, mx - cam.pos[0], my - cam.pos[1], mz - cam.pos[2],
        degree=sh_degree)

    return Projected(u=u, v=v, ca=ca, cb=cb, cc=cc, depth=z, radius=radius,
                     ex=ex, ey=ey, qmax=qmax, red=red, green=green,
                     blue=blue, opacity=opacity, valid=valid)


def tile_grid(width: int, height: int, tile_size: int) -> Tuple[int, int]:
    """(tiles_x, tiles_y) for an image."""
    return (-(-width // tile_size), -(-height // tile_size))
