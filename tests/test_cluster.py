"""K-means + region-growing clustering tests."""

import numpy as np
import pytest

from gsplat_tpu.cluster import kmeans as km
from gsplat_tpu.cluster import region_growing as rg
from gsplat_tpu.io.synthetic import random_scene, sphere_scene
from gsplat_tpu.parallel import mesh as mesh_lib
from gsplat_tpu.scene import GaussianScene, color_to_dc


def _blob_scene(seps=3.0, n_per=60, k=4, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, 3)) * seps
    means = np.concatenate(
        [c + 0.1 * rng.normal(size=(n_per, 3)) for c in centers])
    n = means.shape[0]
    quats = np.zeros((n, 4)); quats[:, 0] = 1
    return GaussianScene.create(
        means, np.full((n, 3), -3.0), quats, np.full(n, 2.0),
        color_to_dc(rng.uniform(size=(n, 3)))[:, None, :]), k


def test_kmeans_recovers_blobs():
    scene, k = _blob_scene()
    feats = km.scene_features(scene, with_color=False)
    # deterministic init: one point from each blob (random init can hit the
    # usual split-blob local optimum, which is correct k-means behavior)
    init = np.asarray(feats)[[0, 60, 120, 180]]
    res = km.kmeans(feats, k=k, max_iter=50, init_centroids=init)
    labels = np.asarray(res.labels)
    for b in range(k):
        blob = labels[b * 60:(b + 1) * 60]
        _, counts = np.unique(blob, return_counts=True)
        assert counts.max() == 60, f"blob {b} impure"
    assert float(res.shift) < 1e-4  # converged under tol


def test_kmeans_random_init_runs():
    scene, k = _blob_scene()
    out, res = km.cluster_scene(scene, k=k, with_color=False, max_iter=10,
                                recolor=True)
    assert np.asarray(out.labels).shape == (240,)
    assert int(res.iterations) <= 10


def test_kmeans_sharded_matches_single():
    scene, k = _blob_scene(seed=1)
    feats = km.scene_features(scene)
    mesh = mesh_lib.make_mesh((2, 4))
    r1 = km.kmeans(feats, k=k, max_iter=20, seed=3)
    r2 = km.kmeans(feats, k=k, max_iter=20, seed=3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(r1.labels), np.asarray(r2.labels))
    np.testing.assert_allclose(np.asarray(r1.centroids),
                               np.asarray(r2.centroids), atol=1e-5)


def test_kmeans_nondivisible_n_sharded():
    scene = random_scene(123, seed=5)
    feats = km.scene_features(scene)
    mesh = mesh_lib.make_mesh((2, 4))
    r = km.kmeans(feats, k=5, max_iter=10, mesh=mesh)
    assert r.labels.shape == (123,)


def test_kmeans_empty_cluster_keeps_centroid():
    # centroid far from all points must survive (k_means.py:125-128)
    feats = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    init = np.vstack([feats[:2], np.full((1, 3), 100.0, np.float32)])
    res = km.kmeans(feats, k=3, max_iter=5, init_centroids=init)
    np.testing.assert_allclose(np.asarray(res.centroids)[2], 100.0)


def test_recolor_uses_palette():
    scene = random_scene(20, seed=7)
    out = km.recolor_scene(scene, np.arange(20) % 8)
    from gsplat_tpu.scene import dc_color
    rgb = dc_color(np.asarray(out.sh)[:, 0, :])
    np.testing.assert_allclose(rgb[0], km.COLORS[0], atol=1e-6)
    np.testing.assert_allclose(rgb[9], km.COLORS[1], atol=1e-6)


def test_normals_on_sphere():
    scene = sphere_scene(400, radius=1.0, seed=9, scale=0.01)
    geo = rg.compute_geometry(scene.to_numpy().means, normals_k=30,
                              neighbors_k=8)
    normals = np.asarray(geo.normals)
    pts = scene.to_numpy().means
    radial = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    align = np.abs(np.sum(normals * radial, axis=1))
    assert np.median(align) > 0.97  # normals ~ radial on a sphere
    # inward flip: dot(n, p - centroid) <= 0 (region_growing.py:115-120)
    centered = pts - pts.mean(0)
    assert (np.sum(normals * centered, axis=1) <= 1e-5).mean() > 0.99


def test_region_growing_separates_two_spheres():
    a = sphere_scene(250, radius=1.0, seed=11, scale=0.01).to_numpy()
    b = sphere_scene(250, radius=1.0, seed=12, scale=0.01).to_numpy()
    means = np.concatenate([a.means, b.means + np.array([5.0, 0, 0])])
    n = means.shape[0]
    quats = np.zeros((n, 4)); quats[:, 0] = 1
    scene = GaussianScene.create(
        means, np.full((n, 3), -4.0), quats, np.full(n, 2.0),
        np.zeros((n, 1, 3)))
    out, geo = rg.segment_scene(
        scene, normals_k=20, neighbors_k=8, residual_threshold=0.2,
        angle_threshold=0.6, recolor=False)
    labels = np.asarray(out.labels)
    # points of sphere A should never share a region with sphere B
    la, lb = set(labels[:250].tolist()), set(labels[250:].tolist())
    assert not (la & lb)
