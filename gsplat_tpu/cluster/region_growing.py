"""Region-growing segmentation on gaussian point clouds.

Re-architecture of 3D_clustering/region_growing.py: the batched geometry
(kNN search, PCA normals, residuals) runs on TPU via jit/vmap — the
reference's per-point scipy loops (region_growing.py:78-163) become blocked
distance matmuls + ``lax.top_k`` + vmapped symmetric eigendecomposition.
The BFS growth itself (py:166-226) is inherently sequential, small, and
offline, so it stays host-side by design (SURVEY.md section 7 hard-part f).

Defaults mirror the reference __main__ (py:272-278): normals_k=2000,
neighbors_k=10, residual threshold 0.1, angle threshold 0.05 rad.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.scene import GaussianScene, color_to_dc


class Geometry(NamedTuple):
    normals: jax.Array     # [N, 3] unit, inward-flipped
    residuals: jax.Array   # [N]
    neighbors: jax.Array   # [N, k_nbr] i32


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_indices(points: jax.Array, k: int, block: int = 1024) -> jax.Array:
    """[N, k] nearest-neighbor indices (self included), blocked distances."""
    n = points.shape[0]
    hp = jax.lax.Precision.HIGHEST
    sq = jnp.sum(points * points, axis=1)

    n_pad = -(-n // block) * block
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))

    def body(i, out):
        chunk = jax.lax.dynamic_slice(pts, (i * block, 0), (block, 3))
        d = (jnp.sum(chunk * chunk, axis=1)[:, None]
             - 2.0 * jnp.dot(chunk, points.T, precision=hp) + sq[None, :])
        _, idx = jax.lax.top_k(-d, k)
        return jax.lax.dynamic_update_slice(out, idx.astype(jnp.int32),
                                            (i * block, 0))

    out = jnp.zeros((n_pad, k), jnp.int32)
    out = jax.lax.fori_loop(0, n_pad // block, body, out)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("k", "block"))
def pca_normals(points: jax.Array, nbrs: jax.Array, k: int,
                block: int = 512) -> Tuple[jax.Array, jax.Array]:
    """Per-point PCA over k neighbors -> (normals [N,3], residuals [N]).

    normal = eigenvector of the smallest eigenvalue of the neighbor
    covariance (region_growing.py:96-113); residual = |n . (p - centroid)|
    (py:149-162); inward flip when dot(n, p - global_centroid) > 0
    (py:115-120).
    """
    n = points.shape[0]
    centroid = jnp.mean(points, axis=0)

    n_pad = -(-n // block) * block
    nbrs_p = jnp.pad(nbrs, ((0, n_pad - n), (0, 0)))
    pts_p = jnp.pad(points, ((0, n_pad - n), (0, 0)))

    def body(i, out):
        normals_acc, resid_acc = out
        nb = jax.lax.dynamic_slice(nbrs_p, (i * block, 0), (block, k))
        p = jax.lax.dynamic_slice(pts_p, (i * block, 0), (block, 3))
        nbp = points[nb]                                  # [block, k, 3]
        mu = jnp.mean(nbp, axis=1, keepdims=True)
        d = nbp - mu
        cov = jnp.einsum("bki,bkj->bij", d, d,
                         precision=jax.lax.Precision.HIGHEST) / k
        _, vecs = jnp.linalg.eigh(cov)                    # ascending eigvals
        nrm = vecs[:, :, 0]                               # smallest -> normal
        flip = jnp.sum(nrm * (p - centroid), axis=1) > 0
        nrm = jnp.where(flip[:, None], -nrm, nrm)
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        resid = jnp.abs(jnp.sum(nrm * (p - mu[:, 0, :]), axis=1))
        normals_acc = jax.lax.dynamic_update_slice(normals_acc, nrm,
                                                   (i * block, 0))
        resid_acc = jax.lax.dynamic_update_slice(resid_acc, resid,
                                                 (i * block,))
        return normals_acc, resid_acc

    out = (jnp.zeros((n_pad, 3), points.dtype), jnp.zeros((n_pad,),
                                                          points.dtype))
    normals, resid = jax.lax.fori_loop(0, n_pad // block, body, out)
    return normals[:n], resid[:n]


def compute_geometry(
    points: np.ndarray,
    *,
    normals_k: int = 2000,
    neighbors_k: int = 10,
) -> Geometry:
    """TPU-batched normals/residuals/adjacency for region growing."""
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    k_n = min(normals_k, n)
    k_b = min(neighbors_k, n)
    nbrs_n = knn_indices(pts, k_n)
    normals, resid = pca_normals(pts, nbrs_n, k_n)
    nbrs_b = nbrs_n[:, :k_b] if k_b <= k_n else knn_indices(pts, k_b)
    return Geometry(normals=normals, residuals=resid, neighbors=nbrs_b)


def grow_regions(
    geometry: Geometry,
    *,
    residual_threshold: float = 0.1,
    angle_threshold: float = 0.05,
    min_region_size: int = 1,
) -> np.ndarray:
    """Smoothness-constrained BFS growth (region_growing.py:166-226),
    host-side. Returns [N] region labels, ordered by descending region size
    (largest region = 0)."""
    normals = np.asarray(geometry.normals)
    resid = np.asarray(geometry.residuals)
    nbrs = np.asarray(geometry.neighbors)
    n = normals.shape[0]
    cos_thr = np.cos(angle_threshold)

    available = np.ones(n, dtype=bool)
    order = np.argsort(resid, kind="stable")
    regions: List[np.ndarray] = []
    ptr = 0
    while True:
        while ptr < n and not available[order[ptr]]:
            ptr += 1
        if ptr >= n:
            break
        seed = order[ptr]
        available[seed] = False
        frontier = [seed]
        members = [seed]
        while frontier:
            cur = frontier.pop()
            cand = nbrs[cur]
            cand = cand[available[cand]]
            if cand.size == 0:
                continue
            ok = np.abs(normals[cand] @ normals[seed]) > cos_thr
            accepted = cand[ok]
            for j in accepted:
                if available[j]:
                    available[j] = False
                    members.append(j)
                    if resid[j] < residual_threshold:
                        frontier.append(j)
        regions.append(np.array(members))

    regions.sort(key=len, reverse=True)
    labels = np.full(n, -1, dtype=np.int32)
    nxt = 0
    for reg in regions:
        if len(reg) >= min_region_size:
            labels[reg] = nxt
            nxt += 1
    return labels


def segment_scene(
    scene: GaussianScene,
    *,
    normals_k: int = 2000,
    neighbors_k: int = 10,
    residual_threshold: float = 0.1,
    angle_threshold: float = 0.05,
    recolor: bool = True,
    seed: int = 0,
) -> Tuple[GaussianScene, Geometry]:
    """Full region-growing pipeline; optional random recolor per region
    (region_growing.py:229-245)."""
    geo = compute_geometry(scene.means, normals_k=normals_k,
                           neighbors_k=neighbors_k)
    labels = grow_regions(geo, residual_threshold=residual_threshold,
                          angle_threshold=angle_threshold)
    out = scene.with_labels(jnp.asarray(labels))
    if recolor:
        rng = np.random.default_rng(seed)
        n_reg = int(labels.max()) + 1
        palette = rng.uniform(0.0, 1.0, size=(max(n_reg, 1), 3))
        rgb = palette[np.clip(labels, 0, None)]
        sh = np.asarray(scene.sh).copy()
        sh[:, 0, :] = color_to_dc(rgb)
        out = dataclasses.replace(out, sh=jnp.asarray(sh))
    return out, geo
