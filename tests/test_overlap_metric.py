"""Point-cloud overlap (collision) metric tests."""
import numpy as np

from echoscene_tpu.eval.metrics import (pointcloud_overlap,
                                        pointcloud_overlap_pair,
                                        fit_points_to_box)

PRED_NAMES = ["in", "left", "none"]
CLASS_NAMES = ["_scene_", "bed", "table", "floor"]


def _unit_cloud(n=200, seed=0):
    return np.random.default_rng(seed).uniform(-0.5, 0.5, (n, 3)).astype(np.float32)


def test_pair_overlap_counts():
    a = _unit_cloud(seed=1)
    b = _unit_cloud(seed=2) + np.array([10, 0, 0], np.float32)
    assert pointcloud_overlap_pair(a, b) == 0
    c = _unit_cloud(seed=3)          # co-located with a
    assert pointcloud_overlap_pair(a, c) > 50


def test_scene_overlap_skips_structural_and_touching():
    clouds = [_unit_cloud(seed=i) for i in range(3)]
    boxes = np.array([[1, 1, 1, 0, 0, 0, 0],     # bed at origin
                      [1, 1, 1, 0.2, 0, 0, 0],   # table overlapping bed
                      [5, 0.1, 5, 0, 0, 0, 0]],  # floor
                     np.float32)
    objs = [1, 2, 3]   # bed, table, floor
    # no triples: bed-table scored, floor pairs skipped (structural)
    res = pointcloud_overlap(clouds, objs, boxes, np.zeros((0, 3), np.int32),
                             CLASS_NAMES, PRED_NAMES)
    assert len(res) == 1 and res[0] > 0
    # 'none' relation between bed/table -> expected touching, skipped
    res2 = pointcloud_overlap(clouds, objs, boxes,
                              np.array([[0, 2, 1]]), CLASS_NAMES, PRED_NAMES)
    assert len(res2) == 0


def test_fit_points_to_box_extent():
    pts = _unit_cloud()
    out = fit_points_to_box(pts, [2, 1, 0.5, 1, 0, -1, 0])
    ext = out.max(0) - out.min(0)
    assert np.allclose(sorted(ext), sorted([2, 1, 0.5]), atol=0.05)
    assert abs(out[:, 1].min()) < 0.05  # bottom at py
