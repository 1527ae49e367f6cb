"""Constraint-metric unit tests with hand-constructed geometry."""
import numpy as np

from echoscene_tpu.eval.metrics import (
    validate_constrains, validate_constrains_changes, new_accuracy_dict,
    box3d_iou, corners_from_box)

# boxes: [l, h, w, x, y, z]; (x,y,z) bottom center; 'left' compares z
PRED_NAMES = ["in", "left", "right", "front", "behind", "close by", "above",
              "standing on", "bigger than", "smaller than", "taller than",
              "shorter than", "symmetrical to"]


def _box(l=1, h=1, w=1, x=0, y=0, z=0):
    return [l, h, w, x, y, z]


def test_left_right_satisfied():
    boxes = np.array([_box(z=-2.0), _box(z=2.0)])
    acc = validate_constrains([[0, 1, 1]], boxes, None, PRED_NAMES)  # 0 left of 1
    assert acc["left"] == [1]
    acc = validate_constrains([[1, 2, 0]], boxes, None, PRED_NAMES)  # 1 right of 0
    assert acc["right"] == [1]
    # violated
    acc = validate_constrains([[1, 1, 0]], boxes, None, PRED_NAMES)
    assert acc["left"] == [0]


def test_overlap_veto():
    # correct z-order but heavily overlapping -> strict veto fails it
    boxes = np.array([_box(l=4, w=4, z=-0.1), _box(l=4, w=4, z=0.1)])
    acc = validate_constrains([[0, 1, 1]], boxes, None, PRED_NAMES, strict=True)
    assert acc["left"] == [0]
    acc = validate_constrains([[0, 1, 1]], boxes, None, PRED_NAMES, strict=False)
    assert acc["left"] == [1]


def test_bigger_taller_standing_close_symm():
    boxes = np.array([
        _box(l=2, h=2, w=2),                 # 0 big
        _box(l=1, h=1, w=1, x=1.2, z=1.2),   # 1 small, near
        _box(l=1, h=1, w=1, x=-1.2, z=-1.2), # 2 mirror of 1
    ])
    acc = validate_constrains([[0, 8, 1]], boxes, None, PRED_NAMES)
    assert acc["bigger"] == [1]
    acc = validate_constrains([[1, 9, 0]], boxes, None, PRED_NAMES)
    assert acc["smaller"] == [1]
    acc = validate_constrains([[0, 10, 1]], boxes, None, PRED_NAMES)
    assert acc["taller"] == [1]
    acc = validate_constrains([[1, 11, 0]], boxes, None, PRED_NAMES)
    assert acc["shorter"] == [1]
    acc = validate_constrains([[0, 7, 1]], boxes, None, PRED_NAMES)
    assert acc["standing on"] == [1]   # same y
    acc = validate_constrains([[0, 5, 1]], boxes, None, PRED_NAMES)
    assert acc["close by"] == [1]
    acc = validate_constrains([[1, 12, 2]], boxes, None, PRED_NAMES)
    assert acc["symmetrical to"] == [1]


def test_keep_filtering():
    boxes = np.array([_box(z=-2.0), _box(z=2.0)])
    triples = [[0, 1, 1]]
    # keep=1 on both -> scored in plain, skipped in changes
    acc = validate_constrains(triples, boxes, np.array([1, 1]), PRED_NAMES)
    assert acc["left"] == [1]
    acc = validate_constrains_changes(triples, boxes, np.array([1, 1]), PRED_NAMES)
    assert acc["left"] == []
    # keep=0 on one -> opposite
    acc = validate_constrains(triples, boxes, np.array([1, 0]), PRED_NAMES)
    assert acc["left"] == []
    acc = validate_constrains_changes(triples, boxes, np.array([1, 0]), PRED_NAMES)
    assert acc["left"] == [1]


def test_box3d_iou_identical_and_disjoint():
    b = np.array(_box(l=2, h=1, w=2))
    iou, iou2d = box3d_iou(b, b, with_translation=True)
    assert abs(iou - 1.0) < 1e-6 and abs(iou2d - 1.0) < 1e-6
    b2 = np.array(_box(l=2, h=1, w=2, x=10))
    iou, iou2d = box3d_iou(b, b2, with_translation=True)
    assert iou == 0.0 and iou2d == 0.0


def test_box3d_iou_half_overlap():
    # two unit boxes offset by half a width in x: intersection area 0.5
    a = np.array(_box())
    b = np.array(_box(x=0.5))
    iou, iou2d = box3d_iou(a, b, with_translation=True)
    # min-volume convention: inter (0.5) / min vol (1.0)
    assert abs(iou - 0.5) < 1e-6
    assert abs(iou2d - 0.5 / 1.5) < 1e-6


def test_corners_shape():
    c = corners_from_box(np.array(_box(l=2, h=3, w=4, x=1, y=2, z=3)),
                         with_translation=True)
    assert c.shape == (8, 3)
    assert c[:, 1].min() == 2.0 and c[:, 1].max() == 5.0  # y in [y, y+h]
