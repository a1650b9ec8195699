"""Camera model: cameras.json schema + view/projection construction.

Schema (Web_Viewer_Gaussians_Selection/cameras.json:1, read at
gaussians_selection.js:1705-1721 and deep_learning_segmentation.py:17-22):
``{id, img_name, width, height, position[3], rotation[3][3], fx, fy}`` where
``rotation`` is the world-to-camera rotation and the translation is
``t = -R @ position`` (deep_learning_segmentation.py:43-82).

Pixel projection semantics match the reference labeler exactly:
``u = fx * x/z + width/2``, ``v = fy * y/z + height/2``
(deep_learning_segmentation.py:76-78). The WebGL NDC matrix
(gaussians_selection.js:66-79) is provided for viewer-export parity.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Sequence, Union

import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera (world-to-camera extrinsics)."""

    id: int
    img_name: str
    width: int
    height: int
    position: np.ndarray   # [3] camera center in world space
    rotation: np.ndarray   # [3, 3] world-to-camera rotation
    fx: float
    fy: float

    @property
    def translation(self) -> np.ndarray:
        """t = -R @ p (deep_learning_segmentation.py:65)."""
        return -self.rotation @ self.position

    def world_to_cam(self, points: np.ndarray) -> np.ndarray:
        """[..., 3] world points -> camera coordinates."""
        return points @ self.rotation.T + self.translation

    def view_matrix(self) -> np.ndarray:
        """4x4 row-vector-convention view matrix (gaussians_selection.js:81-107).

        The reference builds a column-major GL matrix whose math is
        ``cam = view @ [x,1]`` with view = [[R, t],[0,1]]; we return the
        standard [[R, t],[0, 1]] form (apply as ``V @ [x; 1]``).
        """
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = self.rotation
        m[:3, 3] = self.translation
        return m

    def projection_matrix_gl(self, z_near: float = 0.2, z_far: float = 200.0
                             ) -> np.ndarray:
        """WebGL NDC projection (gaussians_selection.js:66-79), row-major."""
        return np.array([
            [2 * self.fx / self.width, 0, 0, 0],
            [0, -2 * self.fy / self.height, 0, 0],
            [0, 0, z_far / (z_far - z_near), -(z_far * z_near) / (z_far - z_near)],
            [0, 0, 1, 0],
        ], dtype=np.float64)

    def resized(self, width: int, height: int) -> "Camera":
        """Scale intrinsics to a new image resolution."""
        sx, sy = width / self.width, height / self.height
        return dataclasses.replace(
            self, width=width, height=height, fx=self.fx * sx, fy=self.fy * sy)

    def to_json(self) -> dict:
        return {
            "id": self.id, "img_name": self.img_name,
            "width": self.width, "height": self.height,
            "position": np.asarray(self.position).tolist(),
            "rotation": np.asarray(self.rotation).tolist(),
            "fy": self.fy, "fx": self.fx,
        }

    @classmethod
    def from_json(cls, d: dict) -> "Camera":
        return cls(
            id=int(d["id"]), img_name=str(d["img_name"]),
            width=int(d["width"]), height=int(d["height"]),
            position=np.asarray(d["position"], dtype=np.float64),
            rotation=np.asarray(d["rotation"], dtype=np.float64),
            fx=float(d["fx"]), fy=float(d["fy"]),
        )


def load_cameras(path: str) -> List[Camera]:
    """Load a cameras.json file (deep_learning_segmentation.py:17-22)."""
    with open(path) as f:
        return [Camera.from_json(d) for d in json.load(f)]


def save_cameras(path: str, cameras: Sequence[Camera]) -> None:
    with open(path, "w") as f:
        json.dump([c.to_json() for c in cameras], f)


def look_at_camera(
    eye: Union[Sequence[float], np.ndarray],
    target: Union[Sequence[float], np.ndarray],
    up: Sequence[float] = (0.0, -1.0, 0.0),
    *,
    width: int = 800,
    height: int = 600,
    fov_x_deg: float = 60.0,
    cam_id: int = 0,
    img_name: str = "synthetic",
) -> Camera:
    """Build a camera looking from ``eye`` toward ``target`` (+z forward)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, dtype=np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # Rows of R are the camera axes expressed in world space: x right,
    # y down (image-v grows downward, matching u/v pixel semantics), z forward.
    rot = np.stack([right, down, fwd], axis=0)
    fx = 0.5 * width / np.tan(np.radians(fov_x_deg) / 2)
    return Camera(id=cam_id, img_name=img_name, width=width, height=height,
                  position=eye, rotation=rot, fx=fx, fy=fx)


def orbit_cameras(
    n: int,
    radius: float,
    *,
    center: Sequence[float] = (0.0, 0.0, 0.0),
    height: float = 0.0,
    width: int = 800,
    img_height: int = 600,
    fov_x_deg: float = 60.0,
) -> List[Camera]:
    """A ring of n cameras orbiting ``center`` (synthetic multi-view rigs)."""
    center = np.asarray(center, dtype=np.float64)
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = center + np.array([radius * np.cos(a), height, radius * np.sin(a)])
        cams.append(look_at_camera(
            eye, center, width=width, height=img_height,
            fov_x_deg=fov_x_deg, cam_id=i, img_name=f"orbit_{i:04d}"))
    return cams
