"""Selection / editing / session-state tests."""

import numpy as np

from gsplat_tpu.config import NO_SELECTION, Config
from gsplat_tpu.interact import edit
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.render.api import render
from gsplat_tpu.scene import GaussianScene, color_to_dc, dc_color

CFG = Config()


def _one_splat(label, pos=(0.0, 0.0, 0.0), color=(1.0, 0, 0)):
    return GaussianScene.create(
        np.array([pos]), np.log(np.full((1, 3), 0.1)),
        np.array([[1.0, 0, 0, 0]]), np.array([6.0]),
        color_to_dc(np.array(color))[None, None, :],
        labels=np.array([label], np.int32))


def _cat(*scenes):
    return GaussianScene(*[
        np.concatenate([np.asarray(getattr(s, f)) for s in scenes])
        for f in ("means", "log_scales", "quats", "opacities", "sh",
                  "labels")])


def test_hit_test_picks_front_gaussian():
    scene = _cat(_one_splat(7, (0, 0, 0)), _one_splat(9, (0, 0, 1.0)))
    cam = look_at_camera((0, 0, -2.0), (0, 0, 0), width=64, height=64)
    lab = edit.hit_test(scene, cam, 32.0, 32.0)
    assert lab == 7  # nearer in depth wins


def test_hit_test_radius_and_miss():
    scene = _one_splat(3)
    cam = look_at_camera((0, 0, -2.0), (0, 0, 0), width=64, height=64)
    assert edit.hit_test(scene, cam, 32.0, 32.0) == 3
    assert edit.hit_test(scene, cam, 5.0, 5.0) == NO_SELECTION


def test_displacement_moves_only_label():
    scene = _cat(_one_splat(1, (-0.5, 0, 0)), _one_splat(2, (0.5, 0, 0)))
    st = edit.EditState().displace(1, (0.0, 0.3, 0.0))
    out = edit.apply_edits(scene, st)
    m = np.asarray(out.means)
    np.testing.assert_allclose(m[0], [-0.5, 0.3, 0.0], atol=1e-6)
    np.testing.assert_allclose(m[1], [0.5, 0.0, 0.0], atol=1e-6)


def test_hide_label_removes_from_render():
    scene = _one_splat(5)
    cam = look_at_camera((0, 0, -2.0), (0, 0, 0), width=32, height=32)
    st = edit.EditState().toggle_visibility(5)
    out = render(edit.apply_edits(scene, st), cam, CFG)
    assert float(np.asarray(out["alpha"]).max()) < 1e-3
    st.toggle_visibility(5)  # toggle back on
    out2 = render(edit.apply_edits(scene, st), cam, CFG)
    assert float(np.asarray(out2["alpha"]).max()) > 0.8


def test_custom_color_mix():
    scene = _one_splat(4, color=(1.0, 0.0, 0.0))
    st = edit.EditState().set_color(4, (0.0, 0.0, 1.0))
    out = edit.apply_edits(scene, st)
    rgb = dc_color(np.asarray(out.sh)[0, 0])
    np.testing.assert_allclose(rgb, [0.4, 0.0, 0.6], atol=1e-6)  # mix 0.6


def test_selection_highlight():
    scene = _one_splat(4, color=(0.0, 1.0, 0.0))
    st = edit.EditState()
    st.selection_mode, st.selected_label = True, 4
    out = edit.apply_edits(scene, st)
    rgb = dc_color(np.asarray(out.sh)[0, 0])
    np.testing.assert_allclose(rgb, [0.5, 0.5, 0.0], atol=1e-6)  # red mix 0.5


def test_session_roundtrip(tmp_path):
    st = (edit.EditState().displace(3, (0.1, 0, 0)).toggle_visibility(8)
          .set_color(2, (0.5, 0.6, 0.7)))
    st.selected_label = 3
    p = str(tmp_path / "session.json")
    st.save(p)
    back = edit.EditState.load(p)
    assert back.displacements[3] == (0.1, 0.0, 0.0)
    assert back.hidden[8] is True
    assert back.colors[2] == (0.5, 0.6, 0.7)
    assert back.selected_label == 3


def test_delete_labels():
    scene = _cat(_one_splat(1), _one_splat(2), _one_splat(3))
    out = edit.delete_labels(scene, [2])
    assert out.num_gaussians == 2
    assert set(np.asarray(out.labels).tolist()) == {1, 3}
