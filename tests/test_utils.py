"""Checkpoint/resume + profiling harness tests."""

import numpy as np
import pytest

from gsplat_tpu.io.cameras import orbit_cameras
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.label import vote
from gsplat_tpu.models import trainer
from gsplat_tpu.utils import checkpoint as ckpt


def test_trainstate_roundtrip(tmp_path):
    scene = random_scene(32, seed=61)
    state = trainer.init_state(scene)
    p = str(tmp_path / "state")
    ckpt.save_pytree(p, state)
    back = ckpt.restore_pytree(p, like=state)
    np.testing.assert_array_equal(np.asarray(back.params.means),
                                  np.asarray(state.params.means))
    assert int(back.step) == 0


def test_vote_resume_matches_full_sweep(tmp_path):
    scene = random_scene(60, seed=62)
    cams = orbit_cameras(6, radius=3.0, width=48, img_height=32)
    rng = np.random.default_rng(0)
    seg = rng.integers(-1, 4, size=(6, 32, 48)).astype(np.int32)

    full, votes_full = vote.assign_labels(scene, cams, seg, num_classes=5,
                                          return_votes=True)

    # first half, checkpoint, resume with second half
    _, votes_a = vote.assign_labels(scene, cams[:3], seg[:3], num_classes=5,
                                    return_votes=True)
    vc = ckpt.VoteCheckpoint(str(tmp_path))
    vc.save(votes_a, next_view=3)
    saved, next_view = vc.load()
    assert next_view == 3
    resumed, votes_b = vote.assign_labels(
        scene, cams[next_view:], seg[next_view:], num_classes=5,
        return_votes=True, initial_votes=saved)
    np.testing.assert_array_equal(np.asarray(votes_b), np.asarray(votes_full))
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))


def test_vote_checkpoint_empty(tmp_path):
    vc = ckpt.VoteCheckpoint(str(tmp_path / "none"))
    votes, nv = vc.load()
    assert votes is None and nv == 0


def test_device_timer_runs():
    import jax.numpy as jnp

    from gsplat_tpu.utils.profiling import Throughput, device_timer

    x = jnp.arange(1024.0)

    def step(a, c):
        return jnp.sum(a * a) * 1e-30 + c * 1e-30

    dt = device_timer(step, (x,), iters=3)
    assert dt > 0
    tp = Throughput()
    rec = tp.record("step", dt, pixels=1024)
    assert rec["mpix_per_s"] > 0
    assert "step" in tp.report()


def test_multiview_train_step_decreases_loss():
    import dataclasses

    import jax.numpy as jnp

    from gsplat_tpu.config import DEFAULT
    from gsplat_tpu.io.cameras import orbit_cameras
    from gsplat_tpu.render.api import render
    from gsplat_tpu.render.projection import CameraParams
    from gsplat_tpu.render.tiles import instance_budget

    scene = random_scene(48, seed=63)
    cams = orbit_cameras(3, radius=3.0, width=64, img_height=48)
    targets = jnp.stack([
        render(scene, c, DEFAULT)["image"] for c in cams])
    rng = np.random.default_rng(0)
    pert = dataclasses.replace(
        scene, means=scene.means + 0.05 * rng.normal(
            size=scene.means.shape).astype(np.float32))

    budget = instance_budget(48, DEFAULT.tiles.chunk, 16.0)
    step = trainer.make_multiview_train_step(
        (64, 48), DEFAULT, lr=2e-3, budget=budget, interpret=True)
    state = trainer.init_state(pert)
    camsb = trainer.stack_cameras(
        [CameraParams.from_camera(c) for c in cams])
    losses = []
    for _ in range(4):
        state, loss, _ = step(state, pert.labels, camsb, targets,
                           jnp.zeros(3))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_cumsum_rows_matches_jnp():
    """blend_pallas.cumsum_rows (one-HBM-pass blocked scan) vs jnp.cumsum,
    including a non-block-multiple row count."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.render.blend_pallas import cumsum_rows

    for b in (64, 1000, 4567):
        x = jax.random.normal(jax.random.PRNGKey(b), (b, 16), jnp.float32)
        got = np.asarray(cumsum_rows(x, interpret=True, blk=512))
        want = np.asarray(jnp.cumsum(x, axis=0))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_eval_sh_soa_matches_packed():
    """eval_sh_soa (per-channel [N] twin) vs eval_sh at every degree."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.render.sh import eval_sh, eval_sh_soa

    key = jax.random.PRNGKey(0)
    n = 257
    sh = jax.random.normal(key, (n, 16, 3), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for deg in (0, 1, 2, 3):
        want = np.asarray(eval_sh(sh, dn, degree=deg))
        r, g, b = eval_sh_soa(sh, d[:, 0], d[:, 1], d[:, 2], degree=deg)
        got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], -1)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=f"deg {deg}")


def test_ssim_stays_in_bounds_at_borders():
    """SAME-padded SSIM windows previously drove border variance negative
    (observed per-view SSIM 1.01 and -0.79); the blurred-ones
    renormalization keeps SSIM within [-1, 1] and exact on self-pairs."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.models.losses import ssim

    x = jax.random.uniform(jax.random.PRNGKey(0), (40, 40, 3))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5
    z = jnp.zeros((40, 40, 3)).at[0].set(1.0)   # border-heavy content
    w = jnp.zeros((40, 40, 3)).at[0].set(0.9)
    v = float(ssim(z, w))
    assert -1.0 <= v <= 1.0
    assert v > 0.9  # nearly identical images
