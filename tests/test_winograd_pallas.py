"""Parity tests for the fused Pallas Winograd conv kernels (interpret mode).

Both kernels are measured-loss experiments on current v5e toolchains (see
kernels/winograd_pallas.py STATUS) and are not wired into the model; these
tests keep them correct for future re-evaluation.
"""
import jax
import jax.numpy as jnp
import pytest

from echoscene_tpu.kernels.winograd_pallas import (
    winograd_conv25d_pallas, winograd_conv3d_pallas)


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def _rel_err(fn, shape, k):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, shape[-1], k), jnp.float32) * 0.2
    ref = _direct(x, w)
    got = fn(x, w, interpret=True)
    assert got.shape == ref.shape
    return float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))


@pytest.mark.parametrize("shape,k", [
    ((2, 8, 4, 4, 8), 8),        # bb>1 geometry (small tiles)
    ((1, 16, 8, 8, 16), 8),      # nz>1 geometry
    ((3, 4, 16, 16, 8), 16),     # K padding to a lane multiple
])
def test_winograd3d_pallas_parity(shape, k):
    # tolerance: bf16 V/U casts inside the kernel (the production compute
    # dtype) against an f32 reference
    assert _rel_err(winograd_conv3d_pallas, shape, k) < 2e-2


def test_winograd3d_pallas_channel_split():
    # C wide enough that no single-kernel geometry fits VMEM -> the wrapper
    # must split the contraction and still match
    err = _rel_err(winograd_conv3d_pallas, (1, 4, 4, 4, 560), 8)
    assert err < 2e-2


@pytest.mark.parametrize("shape,k", [
    ((2, 8, 4, 4, 8), 8),
    ((1, 16, 8, 8, 16), 8),
    ((2, 4, 16, 16, 8), 16),
])
def test_winograd25d_pallas_parity(shape, k):
    assert _rel_err(winograd_conv25d_pallas, shape, k) < 2e-2


def test_winograd25d_bias():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (1, 4, 4, 4, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, 8, 8), jnp.float32) * 0.2
    b = jnp.arange(8, dtype=jnp.float32)
    ref = _direct(x, w) + b
    got = winograd_conv25d_pallas(x, w, b, interpret=True)
    assert float(jnp.max(jnp.abs(ref - got))) < 0.1
