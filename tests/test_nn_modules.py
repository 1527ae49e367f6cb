"""Shape/structure tests for the denoisers and VQ-VAE (tiny configs)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from echoscene_tpu.nn.blocks import timestep_embedding
from echoscene_tpu.nn.mlp import MaskedBatchNorm
from echoscene_tpu.nn.unet1d import LayoutDenoiser
from echoscene_tpu.nn.unet3d import ShapeDenoiser
from echoscene_tpu.nn.vqvae import VQVAE, VectorQuantizer


def test_timestep_embedding_cos_first():
    emb = timestep_embedding(jnp.array([0, 1]), 8)
    e = np.asarray(emb)
    # t=0: cos(0)=1 in first half, sin(0)=0 in second half
    assert np.allclose(e[0, :4], 1.0)
    assert np.allclose(e[0, 4:], 0.0)
    assert e.shape == (2, 8)


def test_masked_batchnorm_train_stats(rng):
    x = rng.normal(loc=3.0, size=(10, 4)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], np.float32)
    bn = MaskedBatchNorm()
    vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask), train=True)
    y, updates = bn.apply(vars_, jnp.asarray(x), jnp.asarray(mask), train=True,
                          mutable=["batch_stats"])
    y = np.asarray(y)
    # normalized over the 5 real rows only
    real = x[:5]
    expect = (real - real.mean(0)) / np.sqrt(real.var(0) + 1e-5)
    assert np.allclose(y[:5], expect, atol=1e-4)
    # running stats moved toward the masked mean
    rm = np.asarray(updates["batch_stats"]["mean"])
    assert np.allclose(rm, 0.1 * real.mean(0), atol=1e-5)


TINY_1D = dict(model_channels=32, num_res_blocks=1, channel_mult=(1, 1),
               attention_resolutions=(2,), num_heads=4, concat_dim=48,
               crossattn_dim=48, gconv_dim=8, gconv_num_layers=2)

_LAYOUT_CACHE = {}


def _layout_model(key: str):
    """Module-level cache: ONE jitted init per conditioning key (init
    compiles dominate suite wall time on the 1-core image)."""
    if key not in _LAYOUT_CACHE:
        r = np.random.default_rng(11)
        N, T = 6, 9
        box = jnp.asarray(r.normal(size=(N, 8)).astype(np.float32))
        obj = jnp.asarray(r.normal(size=(N, 24)).astype(np.float32))
        tri = jnp.asarray(np.stack(
            [r.integers(0, N, T), r.integers(0, 16, T),
             r.integers(0, N, T)], 1).astype(np.int32))
        t = jnp.asarray(r.integers(0, 1000, N).astype(np.int32))
        model = LayoutDenoiser(conditioning_key=key, **TINY_1D)
        vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), box, obj, tri, t)
        out = jax.jit(model.apply)(vars_, box, obj, tri, t)
        _LAYOUT_CACHE[key] = (model, vars_, (box, obj, tri, t), out)
    return _LAYOUT_CACHE[key]


@pytest.mark.parametrize("key", [
    "crossattn",
    pytest.param("concat", marks=pytest.mark.slow),  # second full compile
])
def test_layout_denoiser_shapes(key):
    _, _, (box, *_), out = _layout_model(key)
    assert out.shape == (box.shape[0], 8)
    # zero-init output conv -> exactly zero at init
    assert np.allclose(np.asarray(out), 0.0)


def test_layout_denoiser_mask_invariance(rng):
    """Adding masked padding rows must not change real-row outputs (eval mode,
    running batch stats)."""
    model, vars_, (box, obj, tri, t), out_ref = _layout_model("crossattn")
    N, T = box.shape[0], tri.shape[0]
    pad_n, pad_t = 3, 4
    out = jax.jit(model.apply)(vars_, box, obj, tri, t,
                               obj_mask=jnp.ones(N), triple_mask=jnp.ones(T))

    box_p = jnp.concatenate([box, jnp.asarray(
        rng.normal(size=(pad_n, 8)).astype(np.float32))])
    obj_p = jnp.concatenate([obj, jnp.asarray(
        rng.normal(size=(pad_n, 24)).astype(np.float32))])
    tri_p = jnp.concatenate([tri, jnp.asarray(np.stack(
        [rng.integers(0, N, pad_t), rng.integers(0, 16, pad_t),
         rng.integers(0, N, pad_t)], 1).astype(np.int32))])
    t_p = jnp.concatenate([t, jnp.asarray(
        rng.integers(0, 1000, pad_n).astype(np.int32))])
    om = jnp.concatenate([jnp.ones(N), jnp.zeros(pad_n)])
    tm = jnp.concatenate([jnp.ones(T), jnp.zeros(pad_t)])
    out_p = jax.jit(model.apply)(vars_, box_p, obj_p, tri_p, t_p,
                                 obj_mask=om, triple_mask=tm)
    assert np.allclose(np.asarray(out)[:N], np.asarray(out_p)[:N], atol=1e-5)


def test_shape_denoiser_shapes(shape_den_small):
    f = shape_den_small
    out = f["apply32"](f["vars0"])
    M, R = f["x"].shape[0], f["x"].shape[1]
    assert out.shape == (M, R, R, R, 3)
    assert np.allclose(np.asarray(out), 0.0)  # zero-init head


def test_vqvae_roundtrip_shapes(rng):
    B, R = 2, 16   # tiny resolution for test speed; 2 downs -> 4^3 latent
    x = jnp.asarray(rng.normal(size=(B, R, R, R, 1)).astype(np.float32))
    vq = VQVAE(ch=8, ch_mult=(1, 2), n_embed=32, embed_dim=3, z_channels=3,
               resolution=R)
    # init the FULL graph (encoder + quantizer + decoder params)
    vars_ = jax.jit(vq.init)(jax.random.PRNGKey(0), x)
    z = jax.jit(lambda v, x: vq.apply(v, x, forward_no_quant=True,
                                      encode_only=True))(vars_, x)
    assert z.shape == (B, R // 2, R // 2, R // 2, 3)
    dec = jax.jit(lambda v, z: vq.apply(v, z,
                                        method=VQVAE.decode_no_quant))(vars_, z)
    assert dec.shape == (B, R, R, R, 1)


def test_vector_quantizer_ste(rng):
    z = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    vq = VectorQuantizer(n_embed=16, embed_dim=3)
    vars_ = vq.init(jax.random.PRNGKey(0), z)
    z_q, loss, idx = vq.apply(vars_, z)
    assert z_q.shape == z.shape and idx.shape == (5,)
    assert float(loss) >= 0

    # straight-through: d z_q / d z == identity
    def f(zz):
        out, _, _ = vq.apply(vars_, zz)
        return jnp.sum(out)
    g = jax.grad(f)(z)
    assert np.allclose(np.asarray(g), 1.0)


def test_factored_upsample_conv_parity():
    """repeat2+conv == the factored 2-tap formulation, to f32 rounding
    (blocks.factored_upsample_conv) — both the UNet (H, W) and the VQ-VAE
    (D, H, W) upsample patterns."""
    import jax
    import jax.numpy as jnp
    from echoscene_tpu.nn.blocks import factored_upsample_conv

    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (2, 4, 4, 4, 6), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 3, 6, 5), jnp.float32) * 0.3
    b = jnp.arange(5, dtype=jnp.float32) * 0.1

    for up_axes in [(2, 3), (1, 2, 3)]:
        xr = x
        for ax in up_axes:
            xr = jnp.repeat(xr, 2, axis=ax)
        ref = jax.lax.conv_general_dilated(
            xr, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        got = factored_upsample_conv(x, w, b, up_axes)
        assert got.shape == ref.shape
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-4, (up_axes, err)
