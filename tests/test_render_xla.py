"""Dense XLA renderer vs NumPy oracle: pixel parity + autodiff sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.config import RasterConfig
from gsplat_tpu.io.cameras import look_at_camera
from gsplat_tpu.io.synthetic import random_scene
from gsplat_tpu.ref import rasterizer as ref
from gsplat_tpu.render import blend_xla
from gsplat_tpu.render.projection import CameraParams, project


def _render_dense(scene, cam, cfg=RasterConfig(), background=None):
    proj = project(scene, CameraParams.from_camera(cam), cam.width, cam.height,
                   cfg)
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    return blend_xla.blend_dense(
        proj, order, cam.width, cam.height, cfg,
        labels=jnp.asarray(scene.labels), background=background)


def test_projection_matches_oracle(small_scene, small_camera):
    cfg = RasterConfig()
    p_np = ref.project_np(small_scene, small_camera, cfg)
    p_jx = project(small_scene, CameraParams.from_camera(small_camera),
                   small_camera.width, small_camera.height, cfg)
    valid = np.asarray(p_jx.valid)
    np.testing.assert_array_equal(valid, p_np["valid"])
    m = valid
    np.testing.assert_allclose(np.asarray(p_jx.means2d)[m],
                               p_np["means2d"][m], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_jx.conic)[m], p_np["conic"][m],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_jx.depth)[m], p_np["depth"][m],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_jx.color)[m], p_np["color"][m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_jx.opacity)[m],
                               p_np["opacity"][m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_jx.radius)[m], p_np["radius"][m],
                               rtol=1e-3, atol=1e-3)


def test_dense_image_matches_oracle(small_scene, small_camera):
    out_np = ref.render_np(small_scene, small_camera)
    out_jx = _render_dense(small_scene, small_camera)
    img_j = np.asarray(out_jx["image"])
    err = np.abs(img_j - out_np["image"])
    assert np.median(err) < 1e-5
    assert err.max() < 5e-3, f"max pixel err {err.max()}"
    np.testing.assert_allclose(np.asarray(out_jx["alpha"]), out_np["alpha"],
                               atol=5e-3)
    # label maps agree except where blend weights are near-tied
    lm_j, lm_n = np.asarray(out_jx["label_map"]), out_np["label_map"]
    assert (lm_j != lm_n).mean() < 0.01


def test_dense_with_background(small_scene, small_camera):
    bg = jnp.array([0.2, 0.4, 0.6])
    out = _render_dense(small_scene, small_camera, background=bg)
    out0 = _render_dense(small_scene, small_camera)
    np.testing.assert_allclose(
        np.asarray(out["image"]),
        np.asarray(out0["image"])
        + np.asarray(out0["transmittance"])[..., None] * np.asarray(bg),
        atol=1e-6)


def test_dense_gradients_flow(small_camera):
    scene = random_scene(50, seed=11)

    def loss(means, log_scales, quats, opacities, sh):
        import dataclasses
        s2 = dataclasses.replace(
            scene, means=means, log_scales=log_scales, quats=quats,
            opacities=opacities, sh=sh)
        out = _render_dense(s2, small_camera)
        return jnp.sum(out["image"] ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(scene.means), jnp.asarray(scene.log_scales),
        jnp.asarray(scene.quats), jnp.asarray(scene.opacities),
        jnp.asarray(scene.sh))
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    assert np.abs(np.asarray(g[0])).max() > 0  # means get signal


def test_dense_finite_differences(small_camera):
    """Autodiff grads vs central finite differences (f64 to kill FD noise)."""
    import dataclasses

    scene = random_scene(12, seed=13, extent=0.4)
    cam = small_camera
    with jax.enable_x64():
        camp = CameraParams(
            rot=jnp.asarray(cam.rotation, jnp.float64),
            pos=jnp.asarray(cam.position, jnp.float64),
            fx=jnp.asarray(cam.fx, jnp.float64),
            fy=jnp.asarray(cam.fy, jnp.float64))
        cfg = RasterConfig()

        def loss(means):
            s2 = dataclasses.replace(
                scene, means=means,
                log_scales=jnp.asarray(scene.log_scales, jnp.float64),
                quats=jnp.asarray(scene.quats, jnp.float64),
                opacities=jnp.asarray(scene.opacities, jnp.float64),
                sh=jnp.asarray(scene.sh, jnp.float64))
            proj = project(s2, camp, cam.width, cam.height, cfg)
            order = jnp.argsort(
                jnp.where(proj.valid, proj.depth, jnp.inf), stable=True)
            out = blend_xla.blend_dense(proj, order, cam.width, cam.height,
                                        cfg)
            return jnp.sum(out["image"])

        means0 = jnp.asarray(scene.means, jnp.float64)
        g = np.asarray(jax.grad(loss)(means0))
        rng = np.random.default_rng(0)
        for _ in range(4):
            i, d = rng.integers(0, 12), rng.integers(0, 3)
            eps = 1e-5
            e = np.zeros((12, 3))
            e[i, d] = eps
            fd = (float(loss(means0 + e)) - float(loss(means0 - e))) / (2 * eps)
            assert abs(fd - g[i, d]) < 1e-5 * max(1.0, abs(fd)), \
                (i, d, fd, g[i, d])
