"""Majority-vote labeling + IoU evaluation (the deep_learning_segmentation /
evaluation notebook workflow, scripted): render ground-truth label maps,
strip labels, recover them by voting — naive vs occlusion-aware — and score.

Run: JAX_PLATFORMS=cpu python examples/02_label_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import dataclasses

import numpy as np

from gsplat_tpu.config import DEFAULT
from gsplat_tpu.evaluation.iou import mean_iou
from gsplat_tpu.io.cameras import orbit_cameras
from gsplat_tpu.io.synthetic import sphere_scene
from gsplat_tpu.label import vote
from gsplat_tpu.render.api import render

scene = sphere_scene(1000, radius=1.0, seed=0)
cams = orbit_cameras(4, radius=3.0, width=80, img_height=64)

# "segmentation model" = ground-truth rendered label maps
segs = np.stack([
    np.asarray(render(scene, c, DEFAULT, with_labels=True)["label_map"])
    for c in cams])

bare = dataclasses.replace(scene, labels=np.zeros(1000, np.int32))
naive = np.asarray(vote.assign_labels(bare, cams, segs, num_classes=8))
aware = np.asarray(vote.assign_labels_visible(bare, cams, segs,
                                              num_classes=8))
truth = np.asarray(scene.labels)
print(f"naive vote accuracy:          {(naive == truth).mean():.3f}")
print(f"occlusion-aware accuracy:     {(aware == truth).mean():.3f}")

# IoU of re-rendered label maps against the originals
relabeled = bare.with_labels(aware)
lm = np.asarray(render(relabeled, cams[0], DEFAULT,
                       with_labels=True)["label_map"])
print(f"mean IoU of re-rendered label map: {mean_iou(lm, segs[0]):.3f}")
for line in vote.label_statistics(aware)[:4]:
    print(line)
