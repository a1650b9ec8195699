"""Selection + per-label editing as pure array transforms.

The reference's interaction runtime (gaussians_selection.js L4) mutates GPU
buffers; here every edit is a functional transform of the scene or of an
``EditState`` that is applied before rendering — jit-compatible and
composable with the sharded pipeline.

- hit_test: brute-force nearest projected center within a pixel radius,
  depth tie-break (js:361-395, 10 px radius js:387);
- EditState: label-keyed displacement / visibility / recolor maps
  (js:15-64, 892-971, 281-320) with session persistence (the localStorage
  analogue, js:955-971);
- apply_edits: displacement shifts means, hidden labels zero opacity (the
  alpha-zeroing of js:303-320), custom colors mix into the DC band with the
  reference's 0.6 factor (js:773-780), selection highlight mixes red at 0.5
  (js:795-797).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import InteractConfig, NO_SELECTION
from gsplat_tpu.io.cameras import Camera
from gsplat_tpu.scene import GaussianScene, color_to_dc, dc_color


def hit_test(
    scene: GaussianScene,
    camera: Camera,
    x: float,
    y: float,
    *,
    radius_px: float = 10.0,
) -> int:
    """Label of the nearest gaussian center within ``radius_px`` of (x, y);
    closer-in-depth wins ties (gaussians_selection.js:361-395).
    Returns NO_SELECTION when nothing is hit."""
    means = jnp.asarray(scene.means)
    rot = jnp.asarray(camera.rotation, jnp.float32)
    pos = jnp.asarray(camera.position, jnp.float32)
    pc = means @ rot.T + (-rot @ pos)
    z = pc[:, 2]
    front = z > 0
    zs = jnp.where(front, z, 1.0)
    u = camera.fx * pc[:, 0] / zs + camera.width / 2.0
    v = camera.fy * pc[:, 1] / zs + camera.height / 2.0
    d2 = (u - x) ** 2 + (v - y) ** 2
    hit = front & (d2 <= radius_px * radius_px)
    # nearest in depth among hits (the js picks min camera depth, js:382-391)
    key = jnp.where(hit, z, jnp.inf)
    idx = jnp.argmin(key)
    label = jnp.where(jnp.isfinite(key[idx]),
                      jnp.asarray(scene.labels)[idx], NO_SELECTION)
    return int(label)


@dataclasses.dataclass
class EditState:
    """Label-keyed edit maps (the js uniform managers + worker maps)."""

    displacements: Dict[int, Tuple[float, float, float]] = \
        dataclasses.field(default_factory=dict)
    hidden: Dict[int, bool] = dataclasses.field(default_factory=dict)
    colors: Dict[int, Tuple[float, float, float]] = \
        dataclasses.field(default_factory=dict)
    selected_label: int = NO_SELECTION
    selection_mode: bool = False

    # -- mutations (functional style: return self for chaining) ------------
    def displace(self, label: int, delta, step: float = 1.0) -> "EditState":
        """Accumulate a displacement (js:926-937; arrow-key step js:1465)."""
        cur = np.asarray(self.displacements.get(label, (0.0, 0.0, 0.0)))
        self.displacements[int(label)] = tuple(
            (cur + step * np.asarray(delta, dtype=np.float64)).tolist())
        return self

    def toggle_visibility(self, label: int) -> "EditState":
        self.hidden[int(label)] = not self.hidden.get(int(label), False)
        return self

    def set_color(self, label: int, rgb) -> "EditState":
        self.colors[int(label)] = tuple(float(c) for c in rgb)
        return self

    def reset_displacements(self) -> "EditState":  # js:1360-1369 'R'
        self.displacements.clear()
        return self

    def reset_visibility(self) -> "EditState":     # js:614-622 reset
        self.hidden.clear()
        return self

    def reset_colors(self) -> "EditState":         # js 'C'
        self.colors.clear()
        return self

    # -- session persistence (localStorage analogue, js:955-971) -----------
    def to_json(self) -> str:
        return json.dumps(dict(
            displacements={str(k): list(v)
                           for k, v in self.displacements.items()},
            hidden={str(k): v for k, v in self.hidden.items()},
            colors={str(k): list(v) for k, v in self.colors.items()},
            selected_label=self.selected_label,
            selection_mode=self.selection_mode))

    @classmethod
    def from_json(cls, s: str) -> "EditState":
        d = json.loads(s)
        return cls(
            displacements={int(k): tuple(v)
                           for k, v in d.get("displacements", {}).items()},
            hidden={int(k): bool(v) for k, v in d.get("hidden", {}).items()},
            colors={int(k): tuple(v) for k, v in d.get("colors", {}).items()},
            selected_label=int(d.get("selected_label", NO_SELECTION)),
            selection_mode=bool(d.get("selection_mode", False)))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "EditState":
        with open(path) as f:
            return cls.from_json(f.read())


def apply_edits(
    scene: GaussianScene,
    edits: EditState,
    cfg: InteractConfig = InteractConfig(),
) -> GaussianScene:
    """Apply the edit maps to a scene before rendering (pure transform)."""
    labels = jnp.asarray(scene.labels)
    means = jnp.asarray(scene.means)
    opac = jnp.asarray(scene.opacities)
    sh = jnp.asarray(scene.sh)

    for lab, dxyz in edits.displacements.items():
        means = means + jnp.where(
            (labels == lab)[:, None], jnp.asarray(dxyz, jnp.float32), 0.0)

    for lab, hid in edits.hidden.items():
        if hid:
            # alpha-zeroing analogue (js:303-320): opacity logit -> -inf-ish
            opac = jnp.where(labels == lab, -30.0, opac)

    for lab, rgb in edits.colors.items():
        base = dc_color(sh[:, 0, :])
        mixed = (1.0 - cfg.custom_color_mix) * base \
            + cfg.custom_color_mix * jnp.asarray(rgb, jnp.float32)
        sh = sh.at[:, 0, :].set(jnp.where(
            (labels == lab)[:, None], color_to_dc(mixed), sh[:, 0, :]))

    if edits.selection_mode and edits.selected_label != NO_SELECTION:
        base = dc_color(sh[:, 0, :])
        red = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
        mixed = (1.0 - cfg.highlight_mix) * base + cfg.highlight_mix * red
        sh = sh.at[:, 0, :].set(jnp.where(
            (labels == edits.selected_label)[:, None],
            color_to_dc(mixed), sh[:, 0, :]))

    return dataclasses.replace(scene, means=means, opacities=opac, sh=sh)


def delete_labels(scene: GaussianScene, labels_to_delete) -> GaussianScene:
    """Permanently drop gaussians with the given labels (the viewer's
    hide/delete, made literal: returns a smaller scene)."""
    s = scene.to_numpy()
    keep = ~np.isin(s.labels, np.asarray(list(labels_to_delete)))
    return GaussianScene(
        means=s.means[keep], log_scales=s.log_scales[keep],
        quats=s.quats[keep], opacities=s.opacities[keep], sh=s.sh[keep],
        labels=s.labels[keep])
