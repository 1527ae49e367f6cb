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


def test_flash_attention_bf16_scores_close(rng):
    """Opt-in bf16 score tile: same math at bf16 logit rounding (sampling-only
    quality/speed trade, BASELINE.md round-3)."""
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.kernels.flash_attention import flash_attention

    b, l, h, d = 2, 64, 2, 24
    q = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, l, h, d)).astype(np.float32))
    ref = _einsum_attention(q, k, v, None)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, 32, True)
    assert out.shape == ref.shape
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-9)
    assert rel < 0.02, rel   # bf16 logit rounding, NOT f32-exact


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


def test_fused_conv_gn_silu_matches_reference(rng):
    """conv3d_gn_silu kernel == affine+silu+conv3d+bias+residual in XLA."""
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.kernels.fused_conv import (conv3d_gn_silu,
                                                  conv3d_gn_silu_reference,
                                                  group_norm_affine)

    b, d, h, w, cin, cout = 2, 4, 4, 4, 16, 8
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32)) * 0.1 + 1
    bias_gn = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32)) * 0.1
    gw, gb = group_norm_affine(x, groups=4, eps=1e-5, scale=scale,
                               bias=bias_gn)
    kern = jnp.asarray(
        rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32)) * 0.1
    cb = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)) * 0.1
    res = jnp.asarray(rng.normal(size=(b, d, h, w, cout)).astype(np.float32))

    ref = conv3d_gn_silu_reference(x, gw, gb, kern, cb, residual=res)
    with pltpu.force_tpu_interpret_mode():
        out = conv3d_gn_silu(x, gw, gb, kern, cb, residual=res,
                             interpret=True)
    # kernel casts x to bf16 before the affine (the sampling-path dtype);
    # reference applies the affine in f32 -> one-ulp bf16 differences
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)
    # no-activation / no-residual path
    ref2 = conv3d_gn_silu_reference(x, gw, gb, kern, cb, activate=False)
    with pltpu.force_tpu_interpret_mode():
        out2 = conv3d_gn_silu(x, gw, gb, kern, cb, activate=False,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32), atol=3e-2)


def test_group_norm_affine_matches_group_norm_fast(rng):
    """The folded (w, b) affine reproduces group_norm_fast, incl. the
    analytic pre-normalization channel shift (time-embedding add)."""
    from echoscene_tpu.nn.blocks import group_norm_fast
    from echoscene_tpu.kernels.fused_conv import group_norm_affine

    b, d, h, w, c, g = 2, 4, 4, 4, 16, 4
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.2 + 1
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.2
    shift = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))

    gw, gb = group_norm_affine(x, g, 1e-5, scale, bias)
    want = group_norm_fast(x, g, 1e-5, scale, bias)
    got = x * gw[:, None, None, None, :] + gb[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    gw2, gb2 = group_norm_affine(x, g, 1e-5, scale, bias, shift=shift)
    want2 = group_norm_fast(x + shift[:, None, None, None, :], g, 1e-5,
                            scale, bias)
    got2 = x * gw2[:, None, None, None, :] + gb2[:, None, None, None, :]
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


@pytest.mark.slow
def test_fused_resblock_path_matches_plain(rng):
    """ShapeDenoiser(fused_conv=True) resolves the SAME param tree as the
    plain path and produces matching outputs (bf16 tolerance).

    Slow: the kernel's 128-channel padding makes interpret mode ~64x the
    work at these tiny dims (~2.5 min on this image's CPU)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from echoscene_tpu.nn.unet3d import ShapeDenoiser

    kw = dict(image_size=4, model_channels=16, num_res_blocks=1,
              attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
              context_dim=32, use_checkpoint=False, dtype=jnp.bfloat16,
              gconv_num_layers=2)
    plain = ShapeDenoiser(fused_conv=False, **kw)
    fused = ShapeDenoiser(fused_conv=True, **kw)

    m, t = 3, 5
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(m, 4, 4, 4, 3)).astype(np.float32))
    obj = jnp.asarray(rng.normal(size=(m, 1, 32)).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, m, size=(t, 3)).astype(np.int32))
    tt = jnp.asarray([3, 5, 7], jnp.int32)
    om = jnp.ones((m,), jnp.float32)
    tm = jnp.ones((t,), jnp.float32)

    params = plain.init(key, x, obj, tri, tt, obj_mask=om, triple_mask=tm)
    ref = plain.apply(params, x, obj, tri, tt, obj_mask=om, triple_mask=tm)
    with pltpu.force_tpu_interpret_mode():
        # same param tree resolves against the fused module (scope parity)
        out = fused.apply(params, x, obj, tri, tt, obj_mask=om,
                          triple_mask=tm)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)


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
