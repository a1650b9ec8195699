"""Spherical-harmonics color evaluation (jnp, differentiable, degrees 0-3).

The reference viewer uses only the DC band (gaussians_selection.js:566-569);
higher bands extend capability to view-dependent color, matching the standard
gaussian-PLY ``f_rest`` layout handled by gsplat_tpu/io/ply.py.
Constants are the standard real-SH basis values (see ref/rasterizer.py, the
NumPy oracle twin of this module).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def eval_sh(sh: jax.Array, dirs: jax.Array, degree: int | None = None
            ) -> jax.Array:
    """sh [N, K, 3], dirs [N, 3] unit vectors -> [N, 3] colors >= 0."""
    k = sh.shape[1]
    if degree is not None:
        k = min(k, (degree + 1) ** 2)
    c = SH_C0 * sh[:, 0]
    if k > 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        c = c - SH_C1 * y * sh[:, 1] + SH_C1 * z * sh[:, 2] - SH_C1 * x * sh[:, 3]
    if k > 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        c = (c + SH_C2[0] * xy * sh[:, 4] + SH_C2[1] * yz * sh[:, 5]
             + SH_C2[2] * (2 * zz - xx - yy) * sh[:, 6]
             + SH_C2[3] * xz * sh[:, 7] + SH_C2[4] * (xx - yy) * sh[:, 8])
    if k > 9:
        c = (c + SH_C3[0] * y * (3 * xx - yy) * sh[:, 9]
             + SH_C3[1] * xy * z * sh[:, 10]
             + SH_C3[2] * y * (4 * zz - xx - yy) * sh[:, 11]
             + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12]
             + SH_C3[4] * x * (4 * zz - xx - yy) * sh[:, 13]
             + SH_C3[5] * z * (xx - yy) * sh[:, 14]
             + SH_C3[6] * x * (xx - 3 * yy) * sh[:, 15])
    return jnp.maximum(c + 0.5, 0.0)


def eval_sh_soa(sh: jax.Array, dx: jax.Array, dy: jax.Array, dz: jax.Array,
                degree: int | None = None):
    """Structure-of-arrays twin of :func:`eval_sh` for the render hot path.

    ``sh`` [N, K, 3]; ``dx/dy/dz`` [N] UNnormalized view directions
    (normalized here with the same 1e-12 floor). Returns three [N] color
    arrays — all arithmetic stays [N]-shaped, avoiding the ~13x lane
    under-occupancy of [N, 3] elementwise chains on v5e (see
    Projected docstring). Same math per channel as eval_sh."""
    k = sh.shape[1]
    if degree is not None:
        k = min(k, (degree + 1) ** 2)
    inv_n = 1.0 / jnp.maximum(
        jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-12)
    x, y, z = dx * inv_n, dy * inv_n, dz * inv_n

    def band(ch):
        c = SH_C0 * sh[:, 0, ch]
        if k > 1:
            c = (c - SH_C1 * y * sh[:, 1, ch] + SH_C1 * z * sh[:, 2, ch]
                 - SH_C1 * x * sh[:, 3, ch])
        if k > 4:
            xx, yy, zz = x * x, y * y, z * z
            c = (c + SH_C2[0] * (x * y) * sh[:, 4, ch]
                 + SH_C2[1] * (y * z) * sh[:, 5, ch]
                 + SH_C2[2] * (2 * zz - xx - yy) * sh[:, 6, ch]
                 + SH_C2[3] * (x * z) * sh[:, 7, ch]
                 + SH_C2[4] * (xx - yy) * sh[:, 8, ch])
        if k > 9:
            c = (c + SH_C3[0] * y * (3 * xx - yy) * sh[:, 9, ch]
                 + SH_C3[1] * (x * y) * z * sh[:, 10, ch]
                 + SH_C3[2] * y * (4 * zz - xx - yy) * sh[:, 11, ch]
                 + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12, ch]
                 + SH_C3[4] * x * (4 * zz - xx - yy) * sh[:, 13, ch]
                 + SH_C3[5] * z * (xx - yy) * sh[:, 14, ch]
                 + SH_C3[6] * x * (xx - 3 * yy) * sh[:, 15, ch])
        return jnp.maximum(c + 0.5, 0.0)

    return band(0), band(1), band(2)
