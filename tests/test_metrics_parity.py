"""Cross-execution parity for the eval SCOREBOARD against the reference.

The model forwards are parity-tested in test_torch_parity.py; this module
applies the same ground-truth pattern to the metrics and codecs that score
every accuracy report the framework produces:

  * validate_constrains / validate_constrains_changes
    (reference helpers/metrics_3dfront.py:57-306) — identical accuracy dicts
    on random scenes with threshold-straddling boxes, all keep modes;
  * box3d_iou (:331-365) — identical (iou, iou_2d) pairs;
  * box codecs (helpers/util.py:516-644) — scale/descale, sincos round-trip,
    standardize/destandardize.

The reference module is IMPORTED from /root/reference and EXECUTED (not
copied); its heavy render deps (trimesh/pytorch3d/model.diff_utils.util_3d)
are stubbed — none are touched by the functions under test.

Known intentional divergences NOT asserted here (guards the reference lacks;
behavior differs only on degenerate inputs the reference would crash/NaN on):
eval/metrics.py returns 0.0 where the reference divides by zero
(zero-area/zero-volume boxes), and _polygon_clip guards parallel-edge
denom==0.  pointcloud_overlap's cloud-fitting also differs by design:
the reference's fit_shapes_to_box (helpers/util.py:436-460) rotates with the
Z-UP matrix `get_rotation` — wrong axis convention for y-up 3D-FRONT — and
pointcloud_overlap has no call site anywhere in the reference; ours fits with
the y-up rotation the renderer/assembly path uses.
"""
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_metrics():
    """Import the reference helpers with heavy render deps stubbed."""
    created = []
    for name, attrs in [
        ("trimesh", {}),
        ("pytorch3d", {}),
        ("pytorch3d.structures", {"Meshes": object, "Pointclouds": object}),
        ("model.diff_utils.util_3d", {"sdf_to_mesh": lambda *a, **k: None}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            created.append(name)
    sys.path.insert(0, REF)
    try:
        import helpers.metrics_3dfront as ref_m
        import helpers.util as ref_u
        yield ref_m, ref_u
    finally:
        sys.path.remove(REF)
        for name in created:
            sys.modules.pop(name, None)


# 0 = 'in' (unscored), then the SG-FRONT predicate vocabulary; names carry a
# trailing newline exactly as the reference dataset builds the vocab
# (threedfront_dataset.py:88-89: ['in\n'] + f.readlines()).
PRED_NAMES = ["in\n", "left\n", "right\n", "front\n", "behind\n",
              "close by\n", "above\n", "standing on\n", "bigger than\n",
              "smaller than\n", "taller than\n", "shorter than\n",
              "symmetrical to\n", "same style as\n",
              "same super category as\n", "same material as\n"]
SCORED = [1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12]


def _random_boxes(rng, n):
    """(n, 6) [l, h, w, x, y, z] with threshold-straddling perturbations so
    every rule's pass AND fail branches are exercised."""
    boxes = np.empty((n, 6))
    boxes[:, :3] = rng.uniform(0.2, 2.5, size=(n, 3))         # l, h, w
    boxes[:, 3] = rng.uniform(-3, 3, size=n)                  # x
    boxes[:, 4] = rng.uniform(0.0, 1.5, size=n)               # y (bottom)
    boxes[:, 5] = rng.uniform(-3, 3, size=n)                  # z
    # push some pairs near the rule thresholds (±0.05 gaps, 0.04 standing,
    # 0.45 close-by / symmetry radii, ±15% volume, ±10% height)
    for i in range(0, n - 1, 2):
        j = i + 1
        boxes[j, 5] = boxes[i, 5] + rng.choice([-1, 1]) * rng.uniform(0, 0.12)
        boxes[j, 3] = boxes[i, 3] + rng.choice([-1, 1]) * rng.uniform(0, 0.12)
        boxes[j, 4] = boxes[i, 4] + rng.choice([-1, 1]) * rng.uniform(0, 0.1)
        boxes[j, :3] = boxes[i, :3] * rng.uniform(0.85, 1.18, size=3)
    return boxes


def _all_pred_triples(rng, n, repeats=4):
    triples = []
    for p in SCORED:
        for _ in range(repeats):
            s, o = rng.choice(n, size=2, replace=False)
            triples.append([int(s), int(p), int(o)])
    # unscored predicates must contribute nothing
    triples.append([0, 0, 1])
    triples.append([1, 13, 2])
    return np.asarray(triples, np.int64)


def _ref_accuracy_dict():
    return {k: [] for k in ["left", "right", "front", "behind", "bigger",
                            "smaller", "taller", "shorter", "standing on",
                            "close by", "symmetrical to", "total"]}


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("keep_mode", ["none", "mask"])
def test_validate_constrains_parity(ref_metrics, strict, keep_mode):
    ref_m, _ = ref_metrics
    from echoscene_tpu.eval.metrics import validate_constrains

    vocab = {"pred_idx_to_name": PRED_NAMES}
    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(6, 12))
        boxes = _random_boxes(rng, n)
        triples = _all_pred_triples(rng, n)
        keep = (None if keep_mode == "none"
                else rng.integers(0, 2, size=n).tolist())

        ref_acc = ref_m.validate_constrains(
            torch.as_tensor(triples), torch.as_tensor(boxes), None,
            keep, vocab, _ref_accuracy_dict(), strict=strict)
        got = validate_constrains(triples, boxes, keep, PRED_NAMES,
                                  strict=strict)
        assert got == ref_acc, (seed, strict, keep_mode)
        if keep is None:
            # every scored triple got exactly one total entry
            assert len(got["total"]) == len(triples) - 2


@pytest.mark.parametrize("strict", [True, False])
@pytest.mark.parametrize("keep_mode", ["none", "mask"])
def test_validate_constrains_changes_parity(ref_metrics, strict, keep_mode):
    ref_m, _ = ref_metrics
    from echoscene_tpu.eval.metrics import validate_constrains_changes

    vocab = {"pred_idx_to_name": PRED_NAMES}
    for seed in range(5):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(6, 12))
        boxes = _random_boxes(rng, n)
        triples = _all_pred_triples(rng, n)
        keep = (None if keep_mode == "none"
                else rng.integers(0, 2, size=n).tolist())

        ref_acc = ref_m.validate_constrains_changes(
            torch.as_tensor(triples), torch.as_tensor(boxes), None,
            keep, vocab, _ref_accuracy_dict(), strict=strict)
        got = validate_constrains_changes(triples, boxes, keep, PRED_NAMES,
                                          strict=strict)
        assert got == ref_acc, (seed, strict, keep_mode)


def test_box3d_iou_parity(ref_metrics):
    ref_m, _ = ref_metrics
    from echoscene_tpu.eval.metrics import box3d_iou, corners_from_box

    rng = np.random.default_rng(7)
    for trial in range(200):
        boxes = _random_boxes(rng, 2)
        b1, b2 = boxes[0], boxes[1]
        if trial % 10 == 0:
            # containment case (NOT bit-identical: the reference's unguarded
            # Sutherland–Hodgman is ill-defined on coincident edges and can
            # return a NEGATIVE iou_2d there — seed-dependent; our guarded
            # clipper is the documented divergence on that degenerate input)
            b2 = b1.copy()
            b2[:3] *= 0.7
        ref_iou, ref_iou2d = ref_m.box3d_iou(b1, b2, param6=True,
                                             with_translation=True)
        got_iou, got_iou2d = box3d_iou(b1, b2, with_translation=True)
        assert np.isclose(got_iou, ref_iou, rtol=1e-10, atol=1e-12), trial
        assert np.isclose(got_iou2d, ref_iou2d, rtol=1e-10, atol=1e-12), trial
        np.testing.assert_allclose(
            corners_from_box(b1, with_translation=True),
            ref_m.corners_from_box(b1, param6=True, with_translation=True),
            rtol=1e-12)


def _write_stats(tmp_path, rng):
    lo = rng.uniform(-4, 0, size=3)
    stats = np.concatenate([
        np.array([0.05, 0.05, 0.05]), rng.uniform(2, 4, size=3),   # lhw
        lo, lo + rng.uniform(2, 5, size=3),                        # xyz
        [-np.pi], [np.pi],
    ])
    p = str(tmp_path / "centered_bounds.txt")
    np.savetxt(p, stats)
    return p, stats.astype(np.float64)


@pytest.mark.parametrize("angle", [False, True])
def test_scale_descale_parity(ref_metrics, tmp_path, angle):
    _, ref_u = ref_metrics
    from echoscene_tpu.core.boxes import (scale_box_params,
                                          descale_box_params, load_box_stats)

    rng = np.random.default_rng(11)
    path, stats64 = _write_stats(tmp_path, rng)
    # load_box_stats returns f32 (device-constant precision); parity runs on
    # the f64 values the reference loads — check the loader agrees to f32 eps
    np.testing.assert_allclose(load_box_stats(path), stats64, rtol=1e-7)
    stats = stats64

    boxes = np.concatenate([rng.uniform(0.1, 2.0, size=(6, 3)),
                            rng.uniform(-2, 2, size=(6, 3)),
                            rng.uniform(-np.pi, np.pi, size=(6, 1))], axis=1)
    # reference scales ONE box at a time, in place (helpers/util.py:516-532)
    ref_scaled = np.stack([
        ref_u.scale_box_params(b.copy(), file=path, angle=angle)
        for b in boxes])
    got_scaled = scale_box_params(boxes, stats, angle=angle)
    np.testing.assert_allclose(got_scaled, ref_scaled, rtol=1e-8, atol=1e-10)

    # descale is the reference's batch variant (:542-557), torch path
    ref_back = ref_u.descale_box_params(
        torch.as_tensor(ref_scaled.copy()), file=path, angle=angle).numpy()
    got_back = descale_box_params(got_scaled, stats, angle=angle)
    np.testing.assert_allclose(got_back, ref_back, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(got_back, boxes, rtol=1e-6, atol=1e-8)


def test_sincos_parity(ref_metrics):
    _, ref_u = ref_metrics
    from echoscene_tpu.core.boxes import angle_to_sincos, sincos_to_angle

    rng = np.random.default_rng(13)
    ang = rng.uniform(-np.pi, np.pi, size=(32, 1))
    ref_sc = ref_u.preprocess_angle2sincos(ang)
    got_sc = angle_to_sincos(ang)
    np.testing.assert_allclose(got_sc, ref_sc, rtol=1e-12)

    # round-trip via the reference's TORCH arctan path (its numpy branch
    # row-indexes a (B, 2) input — a reference bug, helpers/util.py:559-562)
    ref_ang = ref_u.postprocess_sincos2arctan(
        torch.as_tensor(ref_sc)).numpy()
    got_ang = sincos_to_angle(got_sc)
    np.testing.assert_allclose(got_ang, ref_ang, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(got_ang, ang, rtol=1e-6, atol=1e-8)


def test_standardize_parity(ref_metrics, tmp_path):
    _, ref_u = ref_metrics
    from echoscene_tpu.core.boxes import (standardize_box_params,
                                          destandardize_box_params)

    rng = np.random.default_rng(17)
    mean = rng.normal(size=7)
    std = rng.uniform(0.5, 2.0, size=7)
    path = str(tmp_path / "mean_std.txt")
    np.savetxt(path, np.stack([mean, std]))

    boxes = rng.normal(size=(5, 7))
    ref_std = np.stack([
        ref_u.standardize_box_params(b, params=7, file=path) for b in boxes])
    got_std = standardize_box_params(boxes, mean, std)
    np.testing.assert_allclose(got_std, ref_std, rtol=1e-12)

    ref_back = np.stack([
        ref_u.destandardize_box_params(b, file=path, params=7)
        for b in ref_std])
    got_back = destandardize_box_params(got_std, mean, std)
    np.testing.assert_allclose(got_back, ref_back, rtol=1e-12)
    np.testing.assert_allclose(got_back, boxes, rtol=1e-9)
