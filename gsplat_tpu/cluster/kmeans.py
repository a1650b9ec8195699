"""K-means clustering on gaussian features (TPU-native, shardable).

Re-architecture of 3D_clustering/k_means.py: the reference's per-point
KDTree-query loop (k_means.py:115-122) becomes one MXU distance matmul +
argmin per iteration; centroid updates are masked segment means with the
empty-cluster-keeps-old-centroid rule (py:124-128). Defaults k=10, tol=1e-4,
max_iter=10 (py:46, 202, 210). Features = concat(xyz, f_dc rgb) (py:109);
a position-only variant mirrors ``k_means_kd_tree`` (py:46-103).

Sharded mode: points over all mesh devices, per-iteration psum of centroid
partial sums/counts (SURVEY.md section 2.23 "cluster-parallelism").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.parallel.mesh import AXES, Mesh
from gsplat_tpu.scene import GaussianScene, color_to_dc

# Reference cluster palette (k_means.py:8, /255).
COLORS = np.array([
    [252, 199, 55], [242, 107, 15], [231, 56, 121], [126, 24, 145],
    [247, 44, 91], [255, 116, 139], [167, 212, 119], [228, 241, 172],
], dtype=np.float32) / 255.0


class KMeansResult(NamedTuple):
    labels: jax.Array      # [N] i32
    centroids: jax.Array   # [k, F]
    iterations: jax.Array  # scalar i32
    shift: jax.Array       # final centroid shift norm


def scene_features(scene: GaussianScene, with_color: bool = True) -> jax.Array:
    """concat(xyz, f_dc) features (k_means.py:109) or xyz only (py:46-103)."""
    if not with_color:
        return jnp.asarray(scene.means)
    return jnp.concatenate(
        [jnp.asarray(scene.means), jnp.asarray(scene.sh)[:, 0, :]], axis=1)


def _assign(x: jax.Array, c: jax.Array) -> jax.Array:
    """argmin_j ||x_i - c_j||^2 via one matmul."""
    hp = jax.lax.Precision.HIGHEST
    d = (jnp.sum(x * x, axis=1, keepdims=True)
         - 2.0 * jnp.dot(x, c.T, precision=hp)
         + jnp.sum(c * c, axis=1)[None, :])
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _partial_sums(x: jax.Array, assign: jax.Array, k: int
                  ) -> Tuple[jax.Array, jax.Array]:
    oh = jax.nn.one_hot(assign, k, dtype=x.dtype)        # [n, k]
    sums = jnp.einsum("nk,nf->kf", oh, x,
                      precision=jax.lax.Precision.HIGHEST)
    counts = jnp.sum(oh, axis=0)
    return sums, counts


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def _kmeans_single(x, init_c, k: int, max_iter: int, tol: float):
    def cond(state):
        _, it, shift = state
        return (it < max_iter) & (shift >= tol)

    def body(state):
        c, it, _ = state
        assign = _assign(x, c)
        sums, counts = _partial_sums(x, assign, k)
        new_c = jnp.where(counts[:, None] > 0,
                          sums / jnp.maximum(counts[:, None], 1.0), c)
        shift = jnp.linalg.norm(new_c - c)
        return new_c, it + 1, shift

    c, it, shift = jax.lax.while_loop(
        cond, body, (init_c, jnp.zeros((), jnp.int32),
                     jnp.full((), jnp.inf, x.dtype)))
    return _assign(x, c), c, it, shift


def kmeans(
    features: jax.Array,
    k: int = 10,
    *,
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    init_centroids: Optional[jax.Array] = None,
) -> KMeansResult:
    """Cluster [N, F] features. With ``mesh``, N is sharded over devices."""
    n, f = features.shape
    if init_centroids is None:
        # random distinct points as initial centroids (k_means.py:111)
        idx = np.random.default_rng(seed).choice(n, size=k, replace=False)
        init_c = jnp.asarray(np.asarray(features)[np.sort(idx)])
    else:
        init_c = jnp.asarray(init_centroids)

    if mesh is None:
        lab, c, it, shift = _kmeans_single(
            jnp.asarray(features), init_c, k, max_iter, tol)
        return KMeansResult(lab, c, it, shift)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size
    n_pad = -(-n // d) * d
    x = jnp.asarray(features)
    if n_pad != n:
        # pad with copies of the first point, assigned but ignored on return
        x = jnp.concatenate([x, jnp.repeat(x[:1], n_pad - n, axis=0)])

    def fn(x_l, c0):
        def cond(state):
            _, it, shift = state
            return (it < max_iter) & (shift >= tol)

        def body(state):
            c, it, _ = state
            assign = _assign(x_l, c)
            sums, counts = _partial_sums(x_l, assign, k)
            sums = jax.lax.psum(sums, AXES)
            counts = jax.lax.psum(counts, AXES)
            new_c = jnp.where(counts[:, None] > 0,
                              sums / jnp.maximum(counts[:, None], 1.0), c)
            return new_c, it + 1, jnp.linalg.norm(new_c - c)

        c, it, shift = jax.lax.while_loop(
            cond, body, (c0, jnp.zeros((), jnp.int32),
                         jnp.full((), jnp.inf, x_l.dtype)))
        return (_assign(x_l, c), c, it[None], shift[None])

    lab, c, it, shift = shard_map(
        fn, mesh=mesh, in_specs=(P(AXES), P()),
        out_specs=(P(AXES), P(), P(), P()), check_vma=False,
    )(x, init_c)
    return KMeansResult(lab[:n], c, it[0], shift[0])


def recolor_scene(scene: GaussianScene, labels: jax.Array,
                  palette: np.ndarray = COLORS) -> GaussianScene:
    """Bake cluster colors into the DC band (k_means.py:140-149)."""
    palette = jnp.asarray(palette, jnp.float32)
    rgb = palette[jnp.asarray(labels) % palette.shape[0]]
    sh = jnp.asarray(scene.sh).at[:, 0, :].set(color_to_dc(rgb))
    import dataclasses
    return dataclasses.replace(scene, sh=sh,
                               labels=jnp.asarray(labels, jnp.int32))


def cluster_scene(
    scene: GaussianScene,
    k: int = 10,
    *,
    with_color: bool = True,
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    recolor: bool = True,
) -> Tuple[GaussianScene, KMeansResult]:
    """k_means.py CLI semantics: cluster, label, optionally recolor."""
    res = kmeans(scene_features(scene, with_color), k, max_iter=max_iter,
                 tol=tol, seed=seed, mesh=mesh)
    out = (recolor_scene(scene, res.labels) if recolor
           else scene.with_labels(jnp.asarray(res.labels, jnp.int32)))
    return out, res
