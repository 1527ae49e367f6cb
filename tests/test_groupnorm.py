"""group_norm_fast must match the naive GroupNorm formulation exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from echoscene_tpu.nn.blocks import group_norm_fast, GroupNorm32


def _naive_gn(x, groups, eps, scale, bias):
    b, *spatial, c = x.shape
    g = x.reshape(b, -1, groups, c // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    y = (g - mean) / np.sqrt(var + eps)
    y = y.reshape(x.shape)
    return y * scale + bias


def test_group_norm_fast_matches_naive(rng):
    for shape, groups in (((2, 4, 4, 4, 224), 32), ((3, 8, 64), 16),
                          ((2, 5, 5, 30), 30)):
        x = rng.normal(size=shape).astype(np.float32) * 2 + 0.5
        c = shape[-1]
        scale = rng.normal(size=c).astype(np.float32)
        bias = rng.normal(size=c).astype(np.float32)
        out = group_norm_fast(jnp.asarray(x), groups, 1e-5,
                              jnp.asarray(scale), jnp.asarray(bias))
        expect = _naive_gn(x, groups, 1e-5, scale, bias)
        assert np.allclose(np.asarray(out), expect, atol=2e-4), shape


def test_group_norm_fast_matches_flax(rng):
    x = rng.normal(size=(2, 6, 6, 64)).astype(np.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    v = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    expect = gn.apply(v, jnp.asarray(x))
    out = group_norm_fast(jnp.asarray(x), 32, 1e-5,
                          jnp.ones(64), jnp.zeros(64))
    assert np.allclose(np.asarray(out), np.asarray(expect), atol=2e-4)


def test_groupnorm32_module(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 3, 64)).astype(np.float32))
    m = GroupNorm32()
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    yn = np.asarray(y)
    assert yn.shape == x.shape
    # normalized: per-sample mean ~0, var ~1
    assert abs(yn.mean()) < 0.05
    assert abs(yn.std() - 1.0) < 0.1
    # bf16 input stays bf16
    yb = m.apply(v, x.astype(jnp.bfloat16))
    assert yb.dtype == jnp.bfloat16
