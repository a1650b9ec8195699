"""CPU NumPy reference rasterizer — the canonical semantics + test oracle.

This module is the full-precision specification of the renderer. The TPU path
(gsplat_tpu/render) must match it allclose on pixels and (via autodiff /
finite differences) on gradients. It is deliberately written in independent
NumPy so TPU-kernel bugs cannot hide in shared code.

Math (projection exactly mirrors the reference viewer's vertex shader
gaussians_selection.js:696-750 and labeler deep_learning_segmentation.py:43-82,
in full precision — the viewer's u8 quantization is an export detail):

1.  ``Sigma3 = R(q) diag(exp(s))^2 R(q)^T``            (js:330-349)
2.  camera transform ``pc = R_wc x + t, t = -R_wc p``   (py:65-68)
3.  pixel center ``u = fx px/pz + W/2, v = fy py/pz + H/2``  (py:76-78)
4.  Jacobian ``J = [[fx/pz, 0, -fx px/pz^2], [0, fy/pz, -fy py/pz^2]]``
    (js:722-726, sign conventions normalized to +v-down pixel space)
5.  ``Sigma2 = (J R_wc) Sigma3 (J R_wc)^T + blur I``    (js:728-729)
6.  ``alpha = min(alpha_max, sigmoid(o) exp(-0.5 d^T Sigma2^{-1} d))``,
    contributions with ``alpha < alpha_min`` are dropped (full-precision
    analogue of js:783-784's 2-sigma discard + u8 floor)
7.  front-to-back "under" compositing in ascending CANONICAL order
    (quantized depth key, gaussian index): the depth key is the positive-f32
    bit pattern of the view depth right-shifted by
    ``max(bit_length(num_tiles) + 1, 10)`` — the exact key the TPU path's
    packed-key instance sort uses (render/tiles.py::depth_qkeys), and the
    full-precision analogue of the reference worker's 16-bit-quantized
    counting sort with its implicit index tie-break (js:417-462, quantize
    js:437). ``C += T alpha c;  T *= 1 - alpha``; background
    ``C += T_final bg``
8.  label map = label of the gaussian with the largest blend weight
    ``T alpha`` per pixel; ``UNLABELED`` where no gaussian contributed.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gsplat_tpu.config import RasterConfig, UNLABELED
from gsplat_tpu.io.cameras import Camera
from gsplat_tpu.scene import GaussianScene

# Real spherical-harmonics basis constants (standard 3DGS convention).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """[..., 4] (w, x, y, z) quaternions -> [..., 3, 3] rotations."""
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = np.empty(q.shape[:-1] + (3, 3), dtype=q.dtype)
    r[..., 0, 0] = 1 - 2 * (y * y + z * z)
    r[..., 0, 1] = 2 * (x * y - w * z)
    r[..., 0, 2] = 2 * (x * z + w * y)
    r[..., 1, 0] = 2 * (x * y + w * z)
    r[..., 1, 1] = 1 - 2 * (x * x + z * z)
    r[..., 1, 2] = 2 * (y * z - w * x)
    r[..., 2, 0] = 2 * (x * z - w * y)
    r[..., 2, 1] = 2 * (y * z + w * x)
    r[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return r


def covariance_3d(log_scales: np.ndarray, quats: np.ndarray) -> np.ndarray:
    """Sigma3 = R diag(exp(s))^2 R^T, [..., 3, 3]."""
    rot = quat_to_rotmat(quats)
    s2 = np.exp(2.0 * log_scales)
    return np.einsum("...ij,...j,...kj->...ik", rot, s2, rot)


def eval_sh(sh: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Evaluate SH colors. sh [N, K, 3], dirs [N, 3] unit -> [N, 3] >= 0."""
    k = sh.shape[1]
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
    return np.maximum(c + 0.5, 0.0)


def project_np(
    scene: GaussianScene,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    z_near: float = 0.2,
    z_far: float = 200.0,
) -> Dict[str, np.ndarray]:
    """Project all gaussians into one camera. Returns per-gaussian arrays:

    means2d [N,2] (pixel coords), conic [N,3] (a,b,c of inverse cov2d),
    cov2d [N,3], depth [N], radius [N] (3.33-sigma pixel radius),
    color [N,3], opacity [N], valid [N] bool.
    """
    s = scene.to_numpy()
    means = s.means.astype(np.float64)
    rot_wc = np.asarray(camera.rotation, dtype=np.float64)
    pc = means @ rot_wc.T + camera.translation  # [N, 3] camera coords
    z = pc[:, 2]
    valid = (z > z_near) & (z < z_far)
    zs = np.where(valid, z, 1.0)  # avoid div-by-zero on culled rows

    fx, fy = camera.fx, camera.fy
    u = fx * pc[:, 0] / zs + camera.width / 2.0
    v = fy * pc[:, 1] / zs + camera.height / 2.0
    means2d = np.stack([u, v], axis=-1)

    sigma3 = covariance_3d(s.log_scales.astype(np.float64),
                           s.quats.astype(np.float64))
    # J rows: d(u)/d(pc), d(v)/d(pc)
    j = np.zeros((means.shape[0], 2, 3))
    j[:, 0, 0] = fx / zs
    j[:, 0, 2] = -fx * pc[:, 0] / zs ** 2
    j[:, 1, 1] = fy / zs
    j[:, 1, 2] = -fy * pc[:, 1] / zs ** 2
    t = j @ rot_wc  # [N, 2, 3]
    cov2d = np.einsum("nij,njk,nlk->nil", t, sigma3, t)
    a = cov2d[:, 0, 0] + cfg.cov2d_blur
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + cfg.cov2d_blur
    det = a * c - b * b
    valid &= det > 0
    det = np.where(det > 0, det, 1.0)
    conic = np.stack([c / det, -b / det, a / det], axis=-1)

    opacity = 1.0 / (1.0 + np.exp(-s.opacities.astype(np.float64)))

    mid = 0.5 * (a + c)
    lam1 = mid + np.sqrt(np.maximum(mid * mid - det, 0.0))
    # Opacity-aware cutoff (matches render/projection.py): alpha >= alpha_min
    # is impossible beyond sqrt(2 ln(opacity/alpha_min)) sigmas, so shrinking
    # the bbox there cannot change the image.
    cutoff = np.minimum(
        np.sqrt(2.0 * np.log(np.maximum(opacity / cfg.alpha_min, 1.0))),
        cfg.sigma_cutoff)
    radius = cutoff * np.sqrt(np.maximum(lam1, 0.0))
    valid &= opacity >= cfg.alpha_min

    # off-screen cull: 3.33-sigma box does not intersect the image rect
    valid &= (u + radius > 0) & (u - radius < camera.width)
    valid &= (v + radius > 0) & (v - radius < camera.height)

    view_dir = means - np.asarray(camera.position)[None, :]
    norm = np.linalg.norm(view_dir, axis=-1, keepdims=True)
    view_dir = view_dir / np.maximum(norm, 1e-12)
    color = eval_sh(s.sh.astype(np.float64), view_dir)

    return dict(means2d=means2d, conic=conic,
                cov2d=np.stack([a, b, c], axis=-1), depth=z, radius=radius,
                color=color, opacity=opacity, valid=valid)


def render_np(
    scene: GaussianScene,
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    *,
    z_near: float = 0.2,
    z_far: float = 200.0,
    background: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Full oracle render. Returns image [H,W,3], alpha [H,W],
    label_map [H,W] i32, transmittance [H,W], plus the projection dict."""
    h, w = camera.height, camera.width
    proj = project_np(scene, camera, cfg, z_near, z_far)
    labels = scene.to_numpy().labels

    # canonical compositing order (see module docstring item 7): quantized
    # f32-depth-bit keys, stable index tie-break — independently implemented
    # twin of render/tiles.py::depth_qkeys/depth_shift
    tiles_x = -(-w // cfg.tile_size)
    tiles_y = -(-h // cfg.tile_size)
    shift = max(int(tiles_x * tiles_y).bit_length() + 1, 10)
    qd = np.asarray(proj["depth"], np.float32).view(np.uint32) >> shift
    idx = np.nonzero(proj["valid"])[0]
    order = idx[np.argsort(qd[idx], kind="stable")]

    img = np.zeros((h, w, 3))
    transmit = np.ones((h, w))
    best_weight = np.zeros((h, w))
    label_map = np.full((h, w), UNLABELED, dtype=np.int32)

    for i in order:
        cx, cy = proj["means2d"][i]
        r = proj["radius"][i]
        x0 = max(int(np.floor(cx - r)), 0)
        x1 = min(int(np.ceil(cx + r)) + 1, w)
        y0 = max(int(np.floor(cy - r)), 0)
        y1 = min(int(np.ceil(cy + r)) + 1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = np.arange(x0, x1) + 0.5 - cx
        ys = np.arange(y0, y1) + 0.5 - cy
        dx = xs[None, :]
        dy = ys[:, None]
        ca, cb, cc = proj["conic"][i]
        q = ca * dx * dx + 2 * cb * dx * dy + cc * dy * dy
        alpha = proj["opacity"][i] * np.exp(-0.5 * q)
        alpha = np.minimum(alpha, cfg.alpha_max)
        alpha = np.where(alpha >= cfg.alpha_min, alpha, 0.0)
        t_here = transmit[y0:y1, x0:x1]
        weight = t_here * alpha
        img[y0:y1, x0:x1] += weight[..., None] * proj["color"][i]
        sel = weight > best_weight[y0:y1, x0:x1]
        label_map[y0:y1, x0:x1][sel] = labels[i]
        best_weight[y0:y1, x0:x1] = np.where(
            sel, weight, best_weight[y0:y1, x0:x1])
        transmit[y0:y1, x0:x1] = t_here * (1.0 - alpha)

    if background is None:
        background = np.asarray(cfg.background)
    img += transmit[..., None] * np.asarray(background)[None, None, :]
    return dict(image=img, alpha=1.0 - transmit, transmittance=transmit,
                label_map=label_map, best_weight=best_weight, projection=proj)
