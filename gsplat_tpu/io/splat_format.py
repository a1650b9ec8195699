"""Viewer-compatible ``.splat`` packing (gaussians_selection.js conventions).

The reference's PLY parser emits a packed 32-byte/row buffer consumed by its
WebGL viewer (js:464-585): position f32x3, exp-activated scale f32x3, color
rgba u8x4 (SH DC -> color via SH_C0, sigmoid opacity), normalized quaternion
quantized to u8x4 via (q/|q|)*128+128 (js:536-554, 566-576), rows ordered by
descending importance ``exp(sx+sy+sz) * sigmoid(opacity)`` (js:513-528).
This module reproduces that export bit-for-bit so scenes edited/labeled here
drop straight into the reference viewer — and reads the format back
(quantization-lossy by construction).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gsplat_tpu.scene import GaussianScene, color_to_dc, dc_color

ROW_BYTES = 32  # js:237, 845


def importance(scene: GaussianScene) -> np.ndarray:
    """exp(sum log_scales) * sigmoid(opacity) (js:513-528)."""
    s = scene.to_numpy()
    vol = np.exp(s.log_scales.sum(axis=1))
    return vol / (1.0 + np.exp(-s.opacities))


def pack_splat(
    scene: GaussianScene,
    *,
    sort_by_importance: bool = True,
) -> Tuple[bytes, np.ndarray]:
    """-> (packed buffer, row-order indices). Labels ride via the order
    array (the viewer keeps labels in a side Int32Array, js:579)."""
    s = scene.to_numpy()
    n = s.num_gaussians
    order = (np.argsort(-importance(scene), kind="stable")
             if sort_by_importance else np.arange(n))

    buf = np.zeros(n, dtype=np.dtype([
        ("position", np.float32, 3),
        ("scale", np.float32, 3),
        ("rgba", np.uint8, 4),
        ("rot", np.uint8, 4),
    ]))
    buf["position"] = s.means[order]
    buf["scale"] = np.exp(s.log_scales[order])
    rgb = dc_color(s.sh[order, 0, :])
    alpha = 1.0 / (1.0 + np.exp(-s.opacities[order]))
    buf["rgba"][:, :3] = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    buf["rgba"][:, 3] = np.clip(alpha * 255.0, 0, 255).astype(np.uint8)
    q = s.quats[order]
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    buf["rot"] = np.clip(q * 128.0 + 128.0, 0, 255).astype(np.uint8)
    assert buf.dtype.itemsize == ROW_BYTES
    return buf.tobytes(), order.astype(np.int32)


def write_splat(path: str, scene: GaussianScene, *,
                labels_path: Optional[str] = None,
                sort_by_importance: bool = True) -> None:
    data, order = pack_splat(scene, sort_by_importance=sort_by_importance)
    with open(path, "wb") as f:
        f.write(data)
    if labels_path is not None:
        scene.to_numpy().labels[order].astype("<i4").tofile(labels_path)


def read_splat(path_or_bytes, labels: Optional[np.ndarray] = None
               ) -> GaussianScene:
    """Unpack a .splat buffer back into a scene (u8-lossy: colors/opacity/
    rotation carry quantization; the viewer treats this as display data)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    buf = np.frombuffer(raw, dtype=np.dtype([
        ("position", np.float32, 3),
        ("scale", np.float32, 3),
        ("rgba", np.uint8, 4),
        ("rot", np.uint8, 4),
    ]))
    n = len(buf)
    alpha = np.clip(buf["rgba"][:, 3].astype(np.float64) / 255.0,
                    1e-6, 1.0 - 1e-6)
    rgb = buf["rgba"][:, :3].astype(np.float64) / 255.0
    quats = (buf["rot"].astype(np.float64) - 128.0) / 128.0
    return GaussianScene.create(
        means=buf["position"],
        log_scales=np.log(np.maximum(buf["scale"], 1e-12)),
        quats=quats,
        opacities=np.log(alpha / (1.0 - alpha)),
        sh=color_to_dc(rgb)[:, None, :],
        labels=labels,
    )
