"""Bounding-box parameter codecs.

Boxes are 7-parameter: (l, h, w, x, y, z, angle) — size, scene-centered
translation, yaw.  Two normalisation modes exist in the reference
(/root/reference/helpers/util.py:516-644): min-max scaling to [-1, 1] from a
stats file (the live path) and mean/std standardisation (legacy bin-angle
path).  Angles travel through the diffusion as (sin, cos) pairs
(helpers/util.py:534-540, 559-568), so the denoised vector is 8-dim:
size(3) + trans(3) + sincos(2).

All functions here are pure and work on both NumPy arrays and JAX arrays
(they only use operators available in both); stats are loaded host-side.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_box_stats(file: str) -> np.ndarray:
    """Load the `centered_bounds_<room>_trainval.txt` stats file.

    Layout (14 floats): min_lhw(3), max_lhw(3), min_xyz(3), max_xyz(3),
    min_angle(1), max_angle(1) — helpers/util.py:519-520.
    """
    stats = np.loadtxt(file).reshape(-1)
    if stats.shape[0] != 14:
        raise NotImplementedError(f"expected 14 stats values, got {stats.shape}")
    return stats.astype(np.float32)


def _split_stats(stats):
    return stats[:3], stats[3:6], stats[6:9], stats[9:12], stats[12:13], stats[13:14]


def scale_box_params(box_params, stats, angle: bool = False):
    """Min-max scale size/loc (and optionally angle) to [-1, 1].

    Matches helpers/util.py:516-532.  `box_params` is (..., 7).
    """
    min_lhw, max_lhw, min_xyz, max_xyz, min_a, max_a = _split_stats(stats)
    xp = jnp if isinstance(box_params, jnp.ndarray) else np
    size = 2 * (box_params[..., :3] - min_lhw) / (max_lhw - min_lhw) - 1
    loc = 2 * (box_params[..., 3:6] - min_xyz) / (max_xyz - min_xyz) - 1
    rest = box_params[..., 6:]
    if angle:
        rest = 2 * (rest - min_a) / (max_a - min_a) - 1
    return xp.concatenate([size, loc, rest], axis=-1)


def descale_box_params(normed, stats, angle: bool = False):
    """Inverse of scale_box_params (helpers/util.py:542-557). `normed` is (..., >=6)."""
    min_lhw, max_lhw, min_xyz, max_xyz, min_a, max_a = _split_stats(stats)
    xp = jnp if isinstance(normed, jnp.ndarray) else np
    size = (normed[..., :3] + 1) / 2 * (max_lhw - min_lhw) + min_lhw
    loc = (normed[..., 3:6] + 1) / 2 * (max_xyz - min_xyz) + min_xyz
    rest = normed[..., 6:]
    if angle and rest.shape[-1] > 0:
        rest = (rest + 1) / 2 * (max_a - min_a) + min_a
    return xp.concatenate([size, loc, rest], axis=-1)


def angle_to_sincos(angle):
    """(..., 1) angle -> (..., 2) (sin, cos); helpers/util.py:534-540."""
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    return xp.concatenate([xp.sin(angle), xp.cos(angle)], axis=-1)


def sincos_to_angle(sincos):
    """(..., 2) (sin, cos) -> (..., 1) angle via arctan2; helpers/util.py:559-568."""
    xp = jnp if isinstance(sincos, jnp.ndarray) else np
    return xp.arctan2(sincos[..., 0:1], sincos[..., 1:2])


def standardize_box_params(box_params, stats_mean, stats_std, scale: float = 3.0):
    """Mean/std standardisation (helpers/util.py:570-590)."""
    return scale * ((box_params - stats_mean) / stats_std)


def destandardize_box_params(box_params, stats_mean, stats_std, scale: float = 3.0):
    return (box_params * stats_std) / scale + stats_mean


def box_vec_from_boxes(boxes7):
    """(..., 7) raw normalized boxes -> (..., 8) diffusion-space vectors."""
    return (jnp if isinstance(boxes7, jnp.ndarray) else np).concatenate(
        [boxes7[..., :6], angle_to_sincos(boxes7[..., 6:7])], axis=-1)


def boxes_from_box_vec(vec8):
    """(..., 8) sampled vectors -> dict of sizes/translations/angles.

    Mirrors EchoToLayout.generate_layout_sg's split (echo2layout.py:120-124)
    plus sincos->angle postprocessing (eval_3dfront.py:283-284).
    """
    return {
        "sizes": vec8[..., 0:3],
        "translations": vec8[..., 3:6],
        "angles": sincos_to_angle(vec8[..., 6:8]),
    }


ANGLE_BIN_EDGES = np.linspace(np.deg2rad(-180), np.deg2rad(180), 24)


def digitize_angle(angle: float) -> float:
    """Angle (rad) -> 15-degree bin index, clamped into [0, 24) like the
    reference train loop (threedfront_dataset.py:300-303 digitize;
    train_3dfront.py:230-233 clamp of out-of-range bins to 0)."""
    b = float(np.digitize(angle, ANGLE_BIN_EDGES))
    return b if 0.0 < b < 24.0 else 0.0


def bin_angles_to_degrees(angles_pred: np.ndarray) -> np.ndarray:
    """Legacy 24-bin angle decode: -180 + (argmax + 1) * 15 degrees
    (eval_3dfront.py:158, :279).  angles_pred: (N, K>=2) bin scores."""
    return -180.0 + (np.argmax(np.asarray(angles_pred), axis=1,
                               keepdims=True) + 1) * 15.0
