"""Native C++ data-path parity vs the NumPy codec."""

import numpy as np
import pytest

from gsplat_tpu.io import native, ply, splat_format
from gsplat_tpu.io.synthetic import random_scene

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_parse_matches_numpy(tmp_path):
    scene = random_scene(500, seed=51, num_labels=6, sh_degree=2)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene)
    a = ply.scene_from_ply(p)
    b = native.scene_from_ply_native(p)
    assert b is not None
    np.testing.assert_array_equal(np.asarray(b.means), np.asarray(a.means))
    np.testing.assert_array_equal(np.asarray(b.log_scales),
                                  np.asarray(a.log_scales))
    np.testing.assert_array_equal(np.asarray(b.quats), np.asarray(a.quats))
    np.testing.assert_array_equal(np.asarray(b.opacities),
                                  np.asarray(a.opacities))
    np.testing.assert_array_equal(np.asarray(b.sh), np.asarray(a.sh))
    np.testing.assert_array_equal(np.asarray(b.labels), np.asarray(a.labels))


def test_native_parse_no_label(tmp_path):
    scene = random_scene(100, seed=52)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene)
    b = native.scene_from_ply_native(p)
    from gsplat_tpu.config import NO_SELECTION
    assert (np.asarray(b.labels) == NO_SELECTION).all()


def test_native_rejects_ascii(tmp_path):
    scene = random_scene(10, seed=53)
    p = str(tmp_path / "s.ply")
    ply.scene_to_ply(p, scene, binary=False)
    assert native.scene_from_ply_native(p) is None  # falls back to NumPy
    assert ply.scene_from_ply(p) is not None


def test_native_importance_order_matches():
    scene = random_scene(300, seed=54)
    s = scene.to_numpy()
    got = native.importance_order_native(s.log_scales, s.opacities)
    want = np.argsort(-splat_format.importance(scene), kind="stable")
    np.testing.assert_array_equal(got, want)


def test_native_splat_pack_matches():
    scene = random_scene(300, seed=55, num_labels=3)
    want, _ = splat_format.pack_splat(scene)
    got = native.pack_splat_native(scene)
    w = np.frombuffer(want, np.uint8).reshape(-1, 32)
    g = np.frombuffer(got, np.uint8).reshape(-1, 32)
    # positions bit-exact; scales may differ 1 ulp (libm expf vs numpy exp);
    # u8 quantization may differ by 1 from that
    np.testing.assert_array_equal(g[:, :12], w[:, :12])
    wf = np.frombuffer(w[:, 12:24].tobytes(), np.float32)
    gf = np.frombuffer(g[:, 12:24].tobytes(), np.float32)
    np.testing.assert_allclose(gf, wf, rtol=1e-6)
    assert np.abs(g[:, 24:].astype(int) - w[:, 24:].astype(int)).max() <= 1
