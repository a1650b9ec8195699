"""32-byte .splat export/import + auto-detecting loader tests."""

import numpy as np

from gsplat_tpu.io import ply, splat_format
from gsplat_tpu.io.synthetic import random_scene


def test_pack_layout_and_order():
    scene = random_scene(100, seed=71)
    data, order = splat_format.pack_splat(scene)
    assert len(data) == 100 * splat_format.ROW_BYTES
    imp = splat_format.importance(scene)
    assert (np.diff(imp[order]) <= 1e-12).all()  # descending importance


def test_splat_roundtrip_within_quantization():
    scene = random_scene(200, seed=72)
    data, order = splat_format.pack_splat(scene, sort_by_importance=False)
    back = splat_format.read_splat(data)
    s = scene.to_numpy()
    np.testing.assert_array_equal(np.asarray(back.means), s.means)
    np.testing.assert_allclose(np.asarray(back.log_scales), s.log_scales,
                               atol=1e-5)
    # u8-quantized fields: colors within 1/255 post-activation
    from gsplat_tpu.scene import dc_color
    got = dc_color(np.asarray(back.sh)[:, 0, :])
    want = np.clip(dc_color(s.sh[:, 0, :]), 0, 1)
    np.testing.assert_allclose(got, want, atol=1.0 / 255.0 + 1e-6)
    # quats within u8 step after normalization
    qw = s.quats / np.linalg.norm(s.quats, axis=1, keepdims=True)
    qg = np.asarray(back.quats) / np.linalg.norm(
        np.asarray(back.quats), axis=1, keepdims=True)
    assert np.abs(np.abs(np.sum(qw * qg, axis=1)) - 1).max() < 1e-3


def test_write_splat_with_labels(tmp_path):
    scene = random_scene(50, seed=73, num_labels=4)
    p = str(tmp_path / "s.splat")
    lp = str(tmp_path / "s.labels")
    splat_format.write_splat(p, scene, labels_path=lp)
    labs = np.fromfile(lp, dtype="<i4")
    _, order = splat_format.pack_splat(scene)
    np.testing.assert_array_equal(labs, scene.to_numpy().labels[order])


def test_load_scene_autodetect(tmp_path):
    scene = random_scene(30, seed=74)
    pply = str(tmp_path / "s.ply")
    psplat = str(tmp_path / "s.splat")
    ply.scene_to_ply(pply, scene)
    splat_format.write_splat(psplat, scene, sort_by_importance=False)
    a = ply.load_scene(pply)
    b = ply.load_scene(psplat)
    np.testing.assert_allclose(np.asarray(a.means), scene.means, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(b.means), scene.means)
