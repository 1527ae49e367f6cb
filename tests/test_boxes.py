import numpy as np
import jax.numpy as jnp

from echoscene_tpu.core import boxes as B


def _stats():
    # min_lhw, max_lhw, min_xyz, max_xyz, min_angle, max_angle
    return np.array([0.1, 0.1, 0.1, 3.0, 2.0, 3.0,
                     -2.0, -2.0, -2.0, 2.0, 2.0, 2.0,
                     -np.pi, np.pi], dtype=np.float32)


def test_scale_descale_roundtrip(rng):
    stats = _stats()
    raw = np.stack([
        rng.uniform(0.1, 3.0, size=(16, 3)).astype(np.float32).reshape(16, 3)[:, 0:3],
    ], axis=0).reshape(16, 3)
    boxes = np.concatenate([
        rng.uniform(0.1, 2.0, size=(16, 3)),
        rng.uniform(-2, 2, size=(16, 3)),
        rng.uniform(-np.pi, np.pi, size=(16, 1)),
    ], axis=-1).astype(np.float32)
    scaled = B.scale_box_params(boxes, stats, angle=False)
    assert scaled[..., :6].min() >= -1.001 and scaled[..., :6].max() <= 1.001
    assert np.allclose(scaled[..., 6], boxes[..., 6])  # angle untouched
    back = B.descale_box_params(scaled, stats, angle=False)
    assert np.allclose(back, boxes, atol=1e-5)


def test_scale_with_angle_roundtrip(rng):
    stats = _stats()
    boxes = np.concatenate([
        rng.uniform(0.1, 2.0, size=(8, 3)),
        rng.uniform(-2, 2, size=(8, 3)),
        rng.uniform(-np.pi, np.pi, size=(8, 1)),
    ], axis=-1).astype(np.float32)
    scaled = B.scale_box_params(boxes, stats, angle=True)
    back = B.descale_box_params(scaled, stats, angle=True)
    assert np.allclose(back, boxes, atol=1e-5)


def test_sincos_roundtrip(rng):
    angles = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, size=(32, 1)).astype(np.float32)
    sc = B.angle_to_sincos(angles)
    assert sc.shape == (32, 2)
    assert np.allclose(sc[:, 0:1] ** 2 + sc[:, 1:2] ** 2, 1.0, atol=1e-5)
    back = B.sincos_to_angle(sc)
    assert np.allclose(back, angles, atol=1e-4)


def test_sincos_jax_matches_numpy(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(8, 1)).astype(np.float32)
    np_sc = B.angle_to_sincos(angles)
    jx_sc = B.angle_to_sincos(jnp.asarray(angles))
    assert np.allclose(np_sc, np.asarray(jx_sc), atol=1e-6)


def test_box_vec_split_roundtrip(rng):
    boxes = np.concatenate([
        rng.uniform(-1, 1, size=(8, 6)),
        rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, size=(8, 1)),
    ], axis=-1).astype(np.float32)
    vec = B.box_vec_from_boxes(boxes)
    assert vec.shape == (8, 8)
    out = B.boxes_from_box_vec(vec)
    assert np.allclose(out["sizes"], boxes[:, :3])
    assert np.allclose(out["translations"], boxes[:, 3:6])
    assert np.allclose(out["angles"], boxes[:, 6:7], atol=1e-4)


def test_standardize_roundtrip(rng):
    mean = rng.normal(size=7).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=7).astype(np.float32)
    x = rng.normal(size=(8, 7)).astype(np.float32)
    z = B.standardize_box_params(x, mean, std)
    back = B.destandardize_box_params(z, mean, std)
    assert np.allclose(back, x, atol=1e-5)
