"""K-means and region-growing clustering (the 3D_clustering workflow).

Run: JAX_PLATFORMS=cpu python examples/04_clustering.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from gsplat_tpu.cluster import kmeans as km
from gsplat_tpu.cluster import region_growing as rg
from gsplat_tpu.io import ply
from gsplat_tpu.io.synthetic import sphere_scene

scene = sphere_scene(1500, radius=1.0, seed=0)

clustered, res = km.cluster_scene(scene, k=8)
print(f"k-means: {int(res.iterations)} iterations, "
      f"final shift {float(res.shift):.2e}")
print("cluster sizes:",
      np.bincount(np.asarray(res.labels), minlength=8).tolist())

segmented, geo = rg.segment_scene(
    scene, normals_k=40, neighbors_k=8, residual_threshold=0.2,
    angle_threshold=0.5)
labels = np.asarray(segmented.labels)
print(f"region growing: {labels.max() + 1} regions; "
      f"median normal residual {float(np.median(np.asarray(geo.residuals))):.4f}")

ply.scene_to_ply("/tmp/example_clustered.ply", clustered)
ply.scene_to_ply("/tmp/example_regions.ply", segmented)
print("wrote /tmp/example_{clustered,regions}.ply")
