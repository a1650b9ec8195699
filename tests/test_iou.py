"""IoU evaluation parity (Image_Segmentation/evaluation.py semantics)."""

import numpy as np

from gsplat_tpu.evaluation import iou as ev


def test_iou_smoke_matches_reference_example():
    # evaluation.py:13-21 inline smoke arrays
    a = np.array([[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
    b = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [0, 1, 0, 0], [0, 0, 0, 0]])
    assert abs(ev.iou(a, b) - 3 / 5) < 1e-12


def test_iou_identical_and_disjoint():
    m = np.eye(4)
    assert ev.iou(m, m) == 1.0
    assert ev.iou(m, 1 - m) == 0.0
    assert ev.iou(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0


def test_best_ious_greedy():
    gt = [np.array([[1, 1], [0, 0]]), np.array([[0, 0], [1, 1]])]
    preds = [np.array([[1, 0], [0, 0]]), np.array([[0, 0], [1, 1]])]
    out = ev.best_ious(preds, gt)
    assert out == [0.5, 1.0]


def test_segmentation_map_from_masks_overwrites():
    m1 = np.array([[1, 1], [0, 0]])
    m2 = np.array([[1, 0], [1, 0]])
    seg = ev.segmentation_map_from_masks([m1, m2])
    assert seg.tolist() == [[2, 1], [2, 0]]


def test_mean_iou_label_maps():
    pred = np.array([[0, 0, 1], [2, 2, 1]])
    assert ev.mean_iou(pred, pred) == 1.0
    gt = np.array([[0, 0, 1], [2, 1, 1]])
    m = ev.mean_iou(pred, gt)
    assert 0.0 < m < 1.0


def test_labelme_mask(tmp_path):
    import json
    p = str(tmp_path / "ann.json")
    with open(p, "w") as f:
        json.dump({"shapes": [
            {"label": "Lego", "points": [[1, 1], [6, 1], [6, 6], [1, 6]]},
            {"label": "other", "points": [[0, 0], [2, 0], [2, 2]]},
        ]}, f)
    mask = ev.labelme_mask(p, "Lego", 8, 8)
    assert mask[3, 3] == 1 and mask[7, 7] == 0
    assert mask.sum() == 36


def test_masks_to_instance_map():
    """SAM-workflow mask painting: area-descending, smaller masks overwrite,
    background -1 (Segment_anything.ipynb semantics)."""
    import numpy as np

    from gsplat_tpu.label.adapters import masks_to_instance_map

    big = np.zeros((8, 8), bool); big[0:6, 0:6] = True      # area 36
    small = np.zeros((8, 8), bool); small[1:3, 1:3] = True  # area 4
    seg = masks_to_instance_map([small, big], 8, 8)
    assert seg[0, 0] == 0          # big mask painted first => rank 0
    assert seg[1, 1] == 1          # small overwrites => rank 1
    assert seg[7, 7] == -1         # background
    assert "sam" in __import__(
        "gsplat_tpu.label.adapters", fromlist=["BACKENDS"]).BACKENDS
