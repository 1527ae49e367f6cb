"""Int8Conv: parameter compatibility with flax Conv + quantization accuracy."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from echoscene_tpu.nn.quant import Int8Conv, quantize_symmetric


def _pair():
    features, rank = 16, 3
    ks = (3,) * rank
    pad = [(1, 1)] * rank
    ref = nn.Conv(features, kernel_size=ks, strides=(1,) * rank, padding=pad)
    q = Int8Conv(features=features, kernel_size=ks, strides=(1,) * rank,
                 padding=pad)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 6, 8))
    return ref, q, x


def test_param_tree_compatible_with_flax_conv():
    ref, q, x = _pair()
    vr = ref.init(jax.random.PRNGKey(1), x)
    vq = q.init(jax.random.PRNGKey(1), x)
    # same names, shapes AND init values -> trained f32 trees drop in as-is
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), vr["params"], vq["params"])


def test_int8_conv_tracks_f32_conv():
    ref, q, x = _pair()
    v = ref.init(jax.random.PRNGKey(1), x)
    y_ref = np.asarray(ref.apply(v, x), np.float32)
    y_q = np.asarray(q.apply(v, x), np.float32)
    # W8A8 with per-channel weight scales: ~1% relative error at this width
    rel = np.abs(y_q - y_ref) / (np.abs(y_ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()
    assert rel.max() < 0.3, rel.max()


def test_int8_dense_param_compat_and_accuracy():
    from echoscene_tpu.nn.quant import Int8Dense

    ref = nn.Dense(24)
    q = Int8Dense(features=24)
    x = jax.random.normal(jax.random.PRNGKey(0), (5, 16))
    vr = ref.init(jax.random.PRNGKey(1), x)
    vq = q.init(jax.random.PRNGKey(1), x)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), vr["params"], vq["params"])
    y_ref = np.asarray(ref.apply(vr, x), np.float32)
    y_q = np.asarray(q.apply(vr, x), np.float32)
    rel = np.abs(y_q - y_ref) / (np.abs(y_ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


@pytest.mark.slow
def test_attention_int8_sentinel_tracks_f32():
    """SpatialTransformer under 'int8': same params, close output.

    slow: full-transformer int8 compile ~40s on the 1-core image; the int8
    primitives (Int8Conv/Int8Dense/quantize) stay in the default selection.

    Params are PERTURBED before the comparison: proj_out is zero-init
    (reference zero_module), so on pristine params both paths return the
    residual input exactly and the comparison is vacuous."""
    from echoscene_tpu.nn.attention import SpatialTransformer
    from tests.conftest import perturb_params

    kw = dict(in_channels=32, n_heads=4, d_head=8, depth=1, context_dim=16)
    m32 = SpatialTransformer(**kw)
    m8 = SpatialTransformer(**kw, dtype="int8")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16))
    v = perturb_params(m32.init(jax.random.PRNGKey(2), x, ctx))
    y32 = np.asarray(m32.apply(v, x, ctx), np.float32)
    y8 = np.asarray(m8.apply(v, x, ctx), np.float32)
    assert np.abs(y32 - np.asarray(x)[..., :32]).mean() > 1e-4  # not vacuous
    rel = np.abs(y8 - y32) / (np.abs(y32).mean() + 1e-6)
    assert rel.mean() < 0.05, rel.mean()


def test_quantize_symmetric_range():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 5)) * 3.0
    q, scale = quantize_symmetric(x, axes=None)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q))) == 127
    s = float(np.asarray(scale).reshape(()))
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(scale),
                               np.asarray(x), atol=s * 0.51)


def test_quantize_act_fixed_scale_hook(monkeypatch):
    """ECHOSCENE_INT8_FIXED_SCALE (A/B measurement hook, BASELINE.md round-3
    close-outs) swaps the dynamic abs-max for a constant scale; unset, the
    dynamic path is bit-identical to quantize_symmetric."""
    from echoscene_tpu.nn.quant import quantize_act

    x = jax.random.normal(jax.random.PRNGKey(3), (6, 7)) * 2.0
    monkeypatch.delenv("ECHOSCENE_INT8_FIXED_SCALE", raising=False)
    q_dyn, s_dyn = quantize_act(x)
    q_ref, s_ref = quantize_symmetric(x, axes=None)
    assert np.array_equal(np.asarray(q_dyn), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s_dyn), np.asarray(s_ref))

    monkeypatch.setenv("ECHOSCENE_INT8_FIXED_SCALE", "0.125")
    q_fix, s_fix = quantize_act(x)
    assert float(np.asarray(s_fix).reshape(())) == 0.125
    expect = np.clip(np.round(np.asarray(x, np.float32) / 0.125), -127, 127)
    np.testing.assert_array_equal(np.asarray(q_fix, np.float32), expect)


@pytest.mark.slow
def test_shape_denoiser_int8_mode_tracks_f32(shape_den_small):
    """ShapeDenoiser under the 'int8' sentinel: same param tree as the f32
    module, output within quantization tolerance.

    slow: the int8 UNet apply compile alone is ~50s on the 1-core image.

    Runs on PERTURBED params: the output head is zero-init (reference
    zero_module), so on pristine params both paths return exactly zero and
    the tolerance check is vacuous.  Model/inputs come from the shared
    session fixture so the f32 init+apply compiles are paid once suite-wide."""
    from echoscene_tpu.nn.unet3d import ShapeDenoiser
    from tests.conftest import perturb_params

    f = shape_den_small
    m8 = ShapeDenoiser(**f["kw"], dtype="int8")
    v = perturb_params(f["vars0"])
    y32 = np.asarray(f["apply32"](v), np.float32)
    assert np.abs(y32).mean() > 1e-4          # perturbed head: not vacuous
    y8 = np.asarray(jax.jit(lambda v: m8.apply(
        v, f["x"], f["obj"], f["tri"], f["t"], **f["masks"]))(v), np.float32)
    assert y8.shape == y32.shape
    scale = np.abs(y32).mean() + 1e-6
    rel = np.abs(y8 - y32) / scale
    # int8 convs + bf16 elsewhere through a full UNet: coarse but bounded
    assert rel.mean() < 0.12, rel.mean()


def test_strided_int8_conv_shapes():
    rank = 3
    q = Int8Conv(features=8, kernel_size=(3,) * rank, strides=(1, 2, 2),
                 padding=[(1, 1)] * rank)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8, 4))
    v = q.init(jax.random.PRNGKey(4), x)
    y = q.apply(v, x)
    assert y.shape == (2, 4, 4, 4, 8)
