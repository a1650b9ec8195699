"""PLY codec round-trip tests (golden-file behavior incl. label property,
ascii vs binary writers — SURVEY.md section 4 item 5)."""

import numpy as np
import pytest

from gsplat_tpu.config import NO_SELECTION
from gsplat_tpu.io import ply
from gsplat_tpu.io.synthetic import random_scene


@pytest.mark.parametrize("binary", [True, False])
def test_scene_roundtrip(tmp_path, binary):
    scene = random_scene(50, seed=3, num_labels=4)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene, binary=binary)
    back = ply.scene_from_ply(p)
    np.testing.assert_allclose(back.means, scene.means, rtol=1e-6)
    np.testing.assert_allclose(back.log_scales, scene.log_scales, rtol=1e-6)
    np.testing.assert_allclose(back.quats, scene.quats, rtol=1e-6)
    np.testing.assert_allclose(back.opacities, scene.opacities, rtol=1e-6)
    np.testing.assert_allclose(back.sh, scene.sh, rtol=1e-6)
    np.testing.assert_array_equal(back.labels, scene.labels)


def test_scene_roundtrip_sh3(tmp_path):
    scene = random_scene(20, seed=4, sh_degree=3)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene)
    back = ply.scene_from_ply(p)
    assert back.sh.shape == (20, 16, 3)
    np.testing.assert_allclose(back.sh, scene.sh, rtol=1e-6)


def test_unlabeled_scene_omits_label(tmp_path):
    scene = random_scene(10, seed=5)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene)
    v = ply.read_ply(p)["vertex"]
    assert "label" not in v.dtype.names
    assert (ply.scene_from_ply(p).labels == NO_SELECTION).all()


def test_add_labels_roundtrip(tmp_path):
    """add_label path of deep_learning_segmentation.py:311-332 / k_means.py:169-194."""
    scene = random_scene(30, seed=6)
    src, dst = str(tmp_path / "in.ply"), str(tmp_path / "out.ply")
    ply.scene_to_ply(src, scene)
    labels = np.arange(30, dtype=np.int32) % 7
    ply.add_labels_to_ply(src, dst, labels, binary=False)
    back = ply.scene_from_ply(dst)
    np.testing.assert_array_equal(back.labels, labels)
    np.testing.assert_allclose(back.means, scene.means, rtol=1e-6)


def test_generic_roundtrip_preserves_properties(tmp_path):
    arr = np.zeros(5, dtype=[("x", "f4"), ("n", "u1"), ("q", "i2"), ("d", "f8")])
    arr["x"] = np.arange(5) * 0.5
    arr["n"] = [0, 1, 2, 3, 255]
    arr["q"] = [-5, 0, 5, 100, -100]
    arr["d"] = np.pi * np.arange(5)
    for binary in (True, False):
        p = str(tmp_path / f"g_{binary}.ply")
        ply.write_ply(p, {"vertex": arr}, binary=binary)
        back = ply.read_ply(p)["vertex"]
        assert back.dtype.names == arr.dtype.names
        for name in arr.dtype.names:
            np.testing.assert_allclose(back[name], arr[name], rtol=1e-9)


def test_bad_header_raises():
    with pytest.raises(ValueError):
        ply.read_ply(b"not a ply file at all")
