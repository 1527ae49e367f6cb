"""Soft rotated IoU: sanity + gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp

from echoscene_tpu.core.box_overlap import soft_rotated_iou_matrix


def _b(l=1, h=1, w=1, x=0, y=0, z=0, yaw=0.0):
    return [l, h, w, x, y, z, yaw]


def test_identical_boxes_high_overlap():
    boxes = jnp.asarray([_b(), _b()], jnp.float32)
    m = soft_rotated_iou_matrix(boxes, k=6, tau=50.0)
    assert float(m[0, 1]) > 0.9
    assert float(m[0, 0]) > 0.9


def test_disjoint_boxes_zero_overlap():
    boxes = jnp.asarray([_b(), _b(x=5.0)], jnp.float32)
    m = soft_rotated_iou_matrix(boxes, k=4, tau=50.0)
    assert float(m[0, 1]) < 1e-3
    assert float(m[1, 0]) < 1e-3


def test_rotation_matters():
    # long thin box rotated 90deg vs aligned: overlap with a thin box differs
    thin = _b(l=0.2, h=1, w=2.0)             # long in x (w)
    other_aligned = _b(l=0.2, h=1, w=2.0)
    other_rot = _b(l=0.2, h=1, w=2.0, yaw=np.pi / 2)
    m_aligned = soft_rotated_iou_matrix(
        jnp.asarray([thin, other_aligned], jnp.float32), k=8, tau=60.0)
    m_rot = soft_rotated_iou_matrix(
        jnp.asarray([thin, other_rot], jnp.float32), k=8, tau=60.0)
    assert float(m_aligned[0, 1]) > float(m_rot[0, 1]) + 0.2


def test_gradient_pushes_boxes_apart():
    def loss(dx):
        boxes = jnp.asarray([_b(), _b()], jnp.float32)
        boxes = boxes.at[1, 3].set(dx)
        return soft_rotated_iou_matrix(boxes, k=4, tau=20.0)[0, 1]
    g = jax.grad(loss)(0.3)
    assert np.isfinite(float(g))
    assert float(g) < 0   # moving +x away reduces overlap
