"""Pallas kernel correctness vs the einsum reference (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from echoscene_tpu.kernels.attention import _einsum_attention


def test_flash_attention_matches_einsum(rng):
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.kernels.flash_attention import flash_attention

    b, l, h, d = 2, 64, 2, 24   # unaligned d exercises the padding path
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))

    ref = _einsum_attention(q, k, v, None)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, q_block=32)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_streaming_attention_matches_einsum(rng):
    """The K-streaming variant (online softmax) must agree with einsum."""
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.kernels.flash_attention import _stream_impl

    b, l, h, d = 1, 96, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    ref = _einsum_attention(q, k, v, None)
    with pltpu.force_tpu_interpret_mode():
        out = _stream_impl(q, k, v, q_block=32, k_block=32)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_chamfer_pallas_matches_reference(rng):
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.kernels.chamfer_pallas import chamfer_pallas
    from echoscene_tpu.eval.pointcloud_metrics import chamfer_distance

    a = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 75, 3)).astype(np.float32))
    ref = chamfer_distance(a, b)
    with pltpu.force_tpu_interpret_mode():
        out = chamfer_pallas(a, b)
    assert np.allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_dispatcher_einsum_path(rng):
    from echoscene_tpu.kernels.attention import dot_product_attention
    q = jnp.asarray(rng.normal(size=(2, 8, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 3, 2, 16)).astype(np.float32))
    out = dot_product_attention(q, k, v)   # cross-attn -> einsum path
    assert out.shape == (2, 8, 2, 16)
    # single-key attention == broadcast of V
    k1 = k[:, :1]
    v1 = v[:, :1]
    out1 = dot_product_attention(q, k1, v1)
    assert np.allclose(np.asarray(out1),
                       np.broadcast_to(np.asarray(v1), out1.shape), atol=1e-6)


def test_single_token_cross_attention_shortcut(rng):
    """Cross-attention to a ONE-token context (the echo conditioning case)
    short-circuits to to_out(to_v(ctx)) broadcast — exactly softmax-over-one-
    key attention; param tree unchanged (to_q/to_k still created at init)."""
    import jax.numpy as jnp
    from echoscene_tpu.nn.attention import CrossAttention

    ca = CrossAttention(query_dim=16, context_dim=12, heads=2, dim_head=8)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 1, 12)).astype(np.float32))
    params = ca.init(jax.random.PRNGKey(0), x, ctx)
    assert {"to_q", "to_k", "to_v", "to_out"} <= set(params["params"])
    out = ca.apply(params, x, ctx)
    # manual single-key attention: weights are 1.0 -> out = to_out(v)
    v = ctx[:, 0] @ params["params"]["to_v"]["kernel"]
    want = v @ params["params"]["to_out"]["kernel"] + \
        params["params"]["to_out"]["bias"]
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(want[:, None], out.shape),
                               atol=1e-5)
