"""Camera math tests: parity with the reference projection conventions."""

import json

import numpy as np

from gsplat_tpu.io.cameras import (Camera, load_cameras, look_at_camera,
                                   orbit_cameras, save_cameras)


def _ref_project(position, camera):
    """Transliteration of deep_learning_segmentation.py:43-82 (the parity
    oracle for pixel-projection semantics)."""
    R = np.array(camera.rotation)
    t = -R @ np.array(camera.position)
    pos_cam = R @ position + t
    if pos_cam[2] <= 0:
        return None
    x = camera.fx * pos_cam[0] / pos_cam[2] + camera.width / 2
    y = camera.fy * pos_cam[1] / pos_cam[2] + camera.height / 2
    return x, y


def test_world_to_cam_matches_reference(rng):
    cam = look_at_camera((1.0, 2.0, -3.0), (0.0, 0.0, 0.0))
    pts = rng.normal(size=(10, 3))
    ours = cam.world_to_cam(pts)
    for i in range(10):
        R = cam.rotation
        expect = R @ pts[i] + (-R @ cam.position)
        np.testing.assert_allclose(ours[i], expect, atol=1e-12)


def test_projection_matches_reference_labeler(rng):
    cam = look_at_camera((0.5, -0.2, -4.0), (0.0, 0.0, 0.0),
                         width=640, height=480)
    pts = rng.uniform(-1, 1, size=(50, 3))
    pc = cam.world_to_cam(pts)
    for i in range(50):
        ref = _ref_project(pts[i], cam)
        if ref is None:
            assert pc[i, 2] <= 0
            continue
        u = cam.fx * pc[i, 0] / pc[i, 2] + cam.width / 2
        v = cam.fy * pc[i, 1] / pc[i, 2] + cam.height / 2
        np.testing.assert_allclose((u, v), ref, atol=1e-9)


def test_look_at_points_at_target():
    cam = look_at_camera((3.0, 1.0, 2.0), (0.0, 0.0, 0.0),
                         width=800, height=600)
    pc = cam.world_to_cam(np.zeros(3))
    # target on the optical axis, in front of camera
    assert pc[2] > 0
    np.testing.assert_allclose(pc[:2], 0.0, atol=1e-9)
    # rotation is orthonormal
    np.testing.assert_allclose(cam.rotation @ cam.rotation.T, np.eye(3),
                               atol=1e-12)


def test_cameras_json_roundtrip(tmp_path):
    cams = orbit_cameras(5, radius=3.0)
    p = str(tmp_path / "cameras.json")
    save_cameras(p, cams)
    back = load_cameras(p)
    assert len(back) == 5
    np.testing.assert_allclose(back[2].rotation, cams[2].rotation)
    np.testing.assert_allclose(back[2].position, cams[2].position)
    assert back[2].img_name == cams[2].img_name
    # schema fields match the reference cameras.json record exactly
    d = json.loads(json.dumps(cams[0].to_json()))
    assert set(d) == {"id", "img_name", "width", "height", "position",
                      "rotation", "fx", "fy"}


def test_reference_cameras_json_loads():
    cams = load_cameras(
        "/root/reference/Web_Viewer_Gaussians_Selection/cameras.json")
    assert len(cams) == 311
    assert cams[0].width == 3114 and cams[0].height == 2075
    np.testing.assert_allclose(
        cams[0].rotation @ cams[0].rotation.T, np.eye(3), atol=1e-6)


def test_resized_preserves_fov():
    cam = look_at_camera((0, 0, -3), (0, 0, 0), width=800, height=600)
    half = cam.resized(400, 300)
    assert half.fx == cam.fx / 2 and half.fy == cam.fy / 2
