"""Winograd F(2,3)^3 conv parity (kernels/winograd.py) and the
parameter-compatible WinogradConv3d module swap (nn/blocks.py).

The Winograd path replaces the XLA direct conv emitter in the sampling shape
UNet (sample_conv='winograd'): same math (Lavin & Gray transforms are exact
in real arithmetic), so f32 parity with lax.conv must hold to rounding.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from echoscene_tpu.kernels.winograd import winograd_conv3d, transform_weights


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 16, 5, 7),   # UNet level-0-like (even cube)
    (2, 16, 8, 8, 8, 4),     # inner-two-dims downsampled (16, 8, 8)
    (1, 16, 4, 4, 6, 3),     # deepest level (16, 4, 4)
    (3, 4, 4, 4, 3, 3),      # tiny test-config size
])
def test_winograd_matches_direct_conv_f32(shape, rng):
    b, d, h, w, c, k = shape
    x = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, k)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, wt, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    got = winograd_conv3d(x, wt, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_transform_weights_precompute_matches(rng):
    c, k = 4, 5
    wt = jnp.asarray(rng.standard_normal((3, 3, 3, c, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, c)), jnp.float32)
    u = transform_weights(wt)
    assert u.shape == (64, c, k)
    a = winograd_conv3d(x, wt)
    b = winograd_conv3d(x, wt, u=u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow  # two full-torso compiles (~24 s); winograd is off-path
def test_winograd_module_swap_param_compatible(rng):
    """A ShapeDenoiser torso built with winograd=True must consume the
    plain-path param tree unchanged and reproduce its f32 outputs."""
    from echoscene_tpu.nn.unet_core import UNetTorso

    def build(winograd):
        return UNetTorso(in_channels=3, model_channels=8, out_channels=3,
                         num_res_blocks=1, attention_resolutions=(2,),
                         channel_mult=(1, 2), num_heads=2, spatial_rank=3,
                         context_dim=16, use_checkpoint=False,
                         winograd=winograd)

    from tests.conftest import perturb_params

    x = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 3)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32)
    plain = build(False)
    # PERTURBED params: the torso ends in a zero-init conv, so a pristine
    # init returns exactly zero from both paths and the value comparison
    # would be vacuous
    params = perturb_params(
        jax.jit(plain.init)(jax.random.PRNGKey(0), x, emb, ctx))
    ref = jax.jit(plain.apply)(params, x, emb, ctx)
    assert float(np.abs(np.asarray(ref)).mean()) > 1e-4
    wino = build(True)
    # identical scopes: init trees match leaf-for-leaf (eval_shape traces
    # the init without compiling it — structure is all we need)
    shapes_w = jax.eval_shape(wino.init, jax.random.PRNGKey(0), x, emb, ctx)
    ref_paths = jax.tree_util.tree_structure(params)
    assert jax.tree_util.tree_structure(shapes_w) == ref_paths
    got = jax.jit(wino.apply)(params, x, emb, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
