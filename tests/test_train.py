"""Losses, metrics, and adaptive density control.

The reference has no training (SURVEY.md critical facts); these cover the
beyond-reference capability: the 3DGS objective (L1 + D-SSIM), PSNR, and
the static-shape densify/prune step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.config import Config
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.models import losses
from gsplat_tpu.models.densify import (DEAD_LOGIT, DensifyConfig,
                                       DensifyStats, densify_and_prune,
                                       num_alive, pad_to_capacity,
                                       reset_opacities)
from gsplat_tpu.models.trainer import (SceneParams, init_state,
                                       make_adaptive_train_step)
from gsplat_tpu.render.api import render


def test_ssim_psnr_basics():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 40, 3)).astype(np.float32))
    assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    assert float(losses.psnr(img, img)) > 100.0
    noisy = img + 0.1
    assert float(losses.ssim(img, noisy)) < 1.0
    # PSNR for a uniform +0.1 offset is exactly 20 dB
    assert float(losses.psnr(img, noisy)) == pytest.approx(20.0, abs=1e-3)
    d = losses.dssim_l1_loss(img, noisy)
    assert 0.0 < float(d) < 1.0
    # differentiable
    g = jax.grad(lambda a: losses.dssim_l1_loss(a, img))(noisy)
    assert np.isfinite(np.asarray(g)).all()


def _padded_scene(n=64, capacity=128):
    scene = random_scene(n, seed=3, extent=1.0, scale_range=(0.02, 0.05),
                         num_labels=4)
    params, labels = pad_to_capacity(
        SceneParams.from_scene(scene), scene.labels, capacity)
    return scene, params, labels


def test_pad_to_capacity_dead_slots_invisible():
    scene, params, labels = _padded_scene()
    assert params.means.shape == (128, 3)
    assert int(num_alive(params)) == 64
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=64, height=64)
    img_small = np.asarray(render(scene, cam)["image"])
    img_padded = np.asarray(
        render(params.to_scene(labels), cam)["image"])
    np.testing.assert_allclose(img_padded, img_small, atol=1e-5)


def test_densify_split_and_clone_fill_dead_slots():
    scene, params, labels = _padded_scene()
    c = params.means.shape[0]
    stats = DensifyStats.zeros(c)
    # mark the first 8 alive gaussians as high-gradient
    g = jnp.zeros((c,)).at[:8].set(1.0)
    stats = DensifyStats(grad_accum=g, count=jnp.ones((c,)))
    cfg = DensifyConfig(grad_threshold=0.5, percent_dense=0.0)  # all split
    out, labels2, stats2, written = densify_and_prune(
        params, labels, stats, jax.random.PRNGKey(0), scene_extent=1.0,
        cfg=cfg)
    assert int(num_alive(out)) == 64 + 8
    # the rewritten-slot mask covers exactly the filled dead slots
    assert int(jnp.sum(written & (jnp.arange(c) < 64))) == 0
    assert int(jnp.sum(written)) == 64  # 8 new children + 56 still-dead
    # children inherit labels from parents
    assert set(np.asarray(labels2[64:72]).tolist()) <= set(
        np.asarray(labels[:8]).tolist())
    # split shrinks the parent scale
    assert float(out.log_scales[0, 0]) < float(params.log_scales[0, 0])
    assert float(jnp.sum(stats2.grad_accum)) == 0.0


def test_densify_prune_kills_transparent():
    scene, params, labels = _padded_scene()
    c = params.means.shape[0]
    # make 10 alive gaussians transparent
    params = params._replace(
        opacities=params.opacities.at[:10].set(-8.0))  # sigmoid ~ 3e-4
    stats = DensifyStats.zeros(c)
    out, _, _, written = densify_and_prune(
        params, labels, stats, jax.random.PRNGKey(0), scene_extent=1.0)
    assert int(num_alive(out)) == 64 - 10
    assert bool(jnp.all(out.opacities[:10] == DEAD_LOGIT))
    # pruned slots are marked rewritten so their Adam moments get zeroed
    assert bool(jnp.all(written[:10]))


def test_reset_opacities_only_touches_alive():
    _, params, _ = _padded_scene()
    out, changed = reset_opacities(params, value=0.01)
    alive = params.opacities > DEAD_LOGIT + 1.0
    assert bool(jnp.all(~changed[~alive]))
    assert bool(jnp.all(out.opacities[~alive] == params.opacities[~alive]))
    assert float(jnp.max(jax.nn.sigmoid(out.opacities[alive]))) <= 0.011


def test_adaptive_training_improves_loss():
    scene, params, labels = _padded_scene(n=48, capacity=96)
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=48, height=48)
    target = jnp.asarray(render(scene, cam)["image"]) * 0.0 + 0.3
    from gsplat_tpu.render.projection import CameraParams
    camp = CameraParams.from_camera(cam)
    step = make_adaptive_train_step((48, 48), Config(), lr=5e-2,
                                    budget=2048, loss="l1")
    state = init_state(params.to_scene(labels), lr=5e-2)
    stats = DensifyStats.zeros(96)
    bg = jnp.zeros(3)
    first = None
    for i in range(6):
        state, stats, loss, nd = step(state, stats, labels, camp, target, bg)
        assert int(nd) == 0
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert float(jnp.max(stats.count)) > 0
    # a densify step keeps everything finite and static-shaped
    out, labels2, stats2, _ = densify_and_prune(
        state.params, labels, stats, jax.random.PRNGKey(1), scene_extent=1.0)
    assert out.means.shape == state.params.means.shape
    assert np.isfinite(np.asarray(out.means)).all()


def test_zero_adam_rows_resets_moments_at_written_slots():
    from gsplat_tpu.models.trainer import zero_adam_rows
    scene, params, labels = _padded_scene()
    c = params.means.shape[0]
    state = init_state(params.to_scene(labels), lr=1e-2)
    # fabricate nonzero moments everywhere
    opt = jax.tree_util.tree_map(
        lambda a: (jnp.ones_like(a) if hasattr(a, "dtype")
                   and jnp.issubdtype(a.dtype, jnp.floating) else a),
        state.opt_state)
    mask = jnp.zeros((c,), bool).at[:5].set(True)
    out = zero_adam_rows(opt, mask)
    mu = out[0].mu  # ScaleByAdamState of the optax.chain's first transform
    assert float(jnp.sum(jnp.abs(mu.means[:5]))) == 0.0
    assert float(jnp.min(jnp.abs(mu.means[5:]))) == 1.0
    assert float(jnp.min(jnp.abs(out[0].nu.quats[:5]))) == 0.0
    # field-restricted variant only touches the named field
    out2 = zero_adam_rows(opt, mask, fields=("opacities",))
    assert float(jnp.sum(jnp.abs(out2[0].mu.opacities[:5]))) == 0.0
    assert float(jnp.min(jnp.abs(out2[0].mu.means[:5]))) == 1.0


def test_multiview_train_step_honors_loss():
    from gsplat_tpu.models.trainer import (make_multiview_train_step,
                                           stack_cameras)
    from gsplat_tpu.render.projection import CameraParams
    scene = random_scene(32, seed=1, extent=1.0, scale_range=(0.05, 0.1),
                         num_labels=2)
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=32, height=32)
    cams = stack_cameras([CameraParams.from_camera(cam)] * 2)
    targets = jnp.zeros((2, 32, 32, 3), jnp.float32) + 0.25
    bg = jnp.zeros(3)
    losses_seen = {}
    for name in ("l2", "l1"):
        step = make_multiview_train_step((32, 32), Config(), lr=1e-2,
                                         budget=1024, loss=name)
        state = init_state(scene, lr=1e-2)
        _, lv, _ = step(state, scene.labels, cams, targets, bg)
        losses_seen[name] = float(lv)
    # different objectives must actually change the computed loss
    assert losses_seen["l2"] != losses_seen["l1"]


def test_train_step_reports_dropped_instances():
    """The train step surfaces num_dropped so budget overflow cannot
    silently bias gradients (VERDICT r3 weak #5): an undersized budget must
    yield nonzero num_dropped, an adequate one zero."""
    from gsplat_tpu.models.trainer import make_train_step

    scene = random_scene(256, seed=11, extent=0.6, scale_range=(0.05, 0.1))
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=48, height=48)
    from gsplat_tpu.render.projection import CameraParams

    camp = CameraParams.from_camera(cam)
    target = jnp.zeros((48, 48, 3), jnp.float32)
    bg = jnp.zeros(3)

    tiny = make_train_step((48, 48), Config(), lr=1e-3, budget=64,
                           interpret=True)
    state = init_state(scene)
    _, _, nd = tiny(state, scene.labels, camp, target, bg)
    assert int(nd) > 0

    from gsplat_tpu.render.api import measure_budgets
    budget, _, _ = measure_budgets(scene, cam, Config())
    ok = make_train_step((48, 48), Config(), lr=1e-3, budget=budget,
                         interpret=True)
    _, _, nd = ok(state, scene.labels, camp, target, bg)
    assert int(nd) == 0


def test_dense_impl_size_guard():
    """impl='dense' refuses scenes whose [H*W, N] matrix would blow memory
    (VERDICT r3 weak #8) with a pointer to the tiled path."""
    scene = random_scene(1100, seed=0)
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=1024, height=1024)
    with pytest.raises(ValueError, match="impl='pallas'"):
        render(scene, cam, Config(), impl="dense")


def test_adaptive_multiview_step_decreases_loss():
    """The random-init fitting recipe (view-averaged gradients + densify
    stats in one scan step, scripts/train_quality.py): loss decreases and
    stats accumulate."""
    from gsplat_tpu.models.densify import DensifyStats
    from gsplat_tpu.models.trainer import (init_state,
                                           make_adaptive_multiview_train_step,
                                           stack_cameras)
    from gsplat_tpu.render.projection import CameraParams

    scene = random_scene(96, seed=21, extent=0.8, scale_range=(0.03, 0.08))
    cam = look_at_camera((0, 0, -3.0), (0, 0, 0), width=32, height=32)
    cams = stack_cameras([CameraParams.from_camera(cam)] * 2)
    from gsplat_tpu.render.api import render as _render
    tgt = jnp.asarray(np.asarray(_render(scene, cam, Config())["image"]))
    targets = jnp.stack([tgt, tgt])
    import dataclasses
    rng = np.random.default_rng(3)
    noisy = dataclasses.replace(
        scene, means=scene.means + 0.05 * rng.normal(
            size=scene.means.shape).astype(np.float32))

    step = make_adaptive_multiview_train_step(
        (32, 32), Config(), lr=5e-3, lr_final=5e-4, decay_steps=20,
        budget=2048, interpret=True)
    state = init_state(noisy, lr=5e-3, lr_final=5e-4, decay_steps=20)
    stats = DensifyStats.zeros(96)
    losses = []
    for _ in range(5):
        state, stats, loss, nd = step(state, stats, noisy.labels, cams,
                                      targets, jnp.zeros(3))
        losses.append(float(loss))
        assert int(nd) == 0
    assert losses[-1] < losses[0], losses
    assert float(jnp.max(stats.count)) > 0
