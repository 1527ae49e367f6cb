"""Rotated 3D box overlap — differentiable soft IoU for the collision loss.

Role reference: the optional IoU collision loss (diffusion_ddpm.py:384-426)
with iou_type='obb' calls mmcv's differentiable rotated-IoU through
helpers/threedfront_box3d.py — but that import is COMMENTED OUT in the
reference (diffusion_ddpm.py:15), so its obb mode is unreachable.  Here a
self-contained differentiable formulation is provided: Monte-Carlo-free soft
point containment.

soft_rotated_iou_matrix(boxes) -> (N, N): boxes are [l, h, w, x, y, z, yaw]
with (x, y, z) the BOTTOM center.  A fixed lattice of points is placed inside
each subject box; each point's soft membership in the object box is the
product of per-axis sigmoids of the signed distance to the faces (in the
object's local frame).  The mean membership approximates Vol(A∩B)/Vol(A) and
is differentiable in every box parameter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _yaw_rot(yaw: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation about +y (helpers/util.py get_rotation_3dfront)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, zeros, -s], -1),
        jnp.stack([zeros, ones, zeros], -1),
        jnp.stack([s, zeros, c], -1),
    ], -2)


def _lattice(k: int) -> jnp.ndarray:
    """(k^3, 3) unit-cube lattice in [-0.5, 0.5] (y in [0, 1])."""
    ax = (jnp.arange(k) + 0.5) / k - 0.5
    gx, gy, gz = jnp.meshgrid(ax, ax + 0.5, ax, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)


def soft_rotated_iou_matrix(boxes: jnp.ndarray, k: int = 4,
                            tau: float = 25.0) -> jnp.ndarray:
    """boxes: (N, 7) [l, h, w, x, y, z, yaw] -> soft pairwise overlap (N, N).

    Entry (i, j) ~ Vol(Bi ∩ Bj) / Vol(Bi) in [0, 1]; differentiable.
    """
    n = boxes.shape[0]
    size = boxes[:, :3]                       # (l, h, w)
    center = boxes[:, 3:6]
    yaw = boxes[:, 6]
    rot = _yaw_rot(yaw)                       # local->world is R_inv in the
    rot_inv = jnp.swapaxes(rot, -1, -2)       # reference; orthonormal

    pts_local = _lattice(k)                   # (P, 3) in unit box
    # world points of each subject box: scale (w, h, l) on (x, y, z), then
    # local->world = R(yaw)^T (rot is world->local, matching
    # eval/metrics.fit_points_to_box's R_inv); r4 fix: this used to apply
    # rot AGAIN, double-rotating subject points — a yawed box failed to
    # contain itself (0.20 self-overlap at yaw=pi/4; tests/test_obb_oracle.py)
    scale = jnp.stack([size[:, 2], size[:, 1], size[:, 0]], -1)  # (N, 3)
    pts = pts_local[None] * scale[:, None, :]                    # (N, P, 3)
    pts = jnp.einsum("nij,npj->npi", rot_inv, pts)
    pts = pts + center[:, None, :]

    # membership of every subject point in every object box
    rel = pts[:, None, :, :] - center[None, :, None, :]          # (N, N, P, 3)
    local = jnp.einsum("mij,nmpj->nmpi", rot, rel)
    half = jnp.stack([size[:, 2] / 2, size[:, 1] / 2, size[:, 0] / 2], -1)
    # y spans [0, h] rather than [-h/2, h/2]
    local = local.at[..., 1].add(-half[None, :, None, 1])
    dist = half[None, :, None, :] - jnp.abs(local)               # >0 inside
    memb = jax.nn.sigmoid(tau * dist).prod(-1)                   # (N, N, P)
    return memb.mean(-1)
