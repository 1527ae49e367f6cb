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


@pytest.mark.parametrize("key", ["crossattn", "concat"])
def test_layout_denoiser_shapes(key, rng):
    N, T = 6, 9
    box_t = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    obj_embed = jnp.asarray(rng.normal(size=(N, 24)).astype(np.float32))
    triples = jnp.asarray(
        np.stack([rng.integers(0, N, T), rng.integers(0, 16, T),
                  rng.integers(0, N, T)], 1).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
    model = LayoutDenoiser(conditioning_key=key, **TINY_1D)
    vars_ = model.init(jax.random.PRNGKey(0), box_t, obj_embed, triples, t)
    out = model.apply(vars_, box_t, obj_embed, triples, t)
    assert out.shape == (N, 8)
    # zero-init output conv -> exactly zero at init
    assert np.allclose(np.asarray(out), 0.0)


def test_layout_denoiser_mask_invariance(rng):
    """Adding masked padding rows must not change real-row outputs (eval mode,
    running batch stats)."""
    N, T, pad_n, pad_t = 5, 6, 3, 4
    box = rng.normal(size=(N, 8)).astype(np.float32)
    obj = rng.normal(size=(N, 24)).astype(np.float32)
    tri = np.stack([rng.integers(0, N, T), rng.integers(0, 16, T),
                    rng.integers(0, N, T)], 1).astype(np.int32)
    t = rng.integers(0, 1000, N).astype(np.int32)

    model = LayoutDenoiser(conditioning_key="crossattn", **TINY_1D)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(box), jnp.asarray(obj),
                       jnp.asarray(tri), jnp.asarray(t))
    out = model.apply(vars_, jnp.asarray(box), jnp.asarray(obj),
                      jnp.asarray(tri), jnp.asarray(t),
                      obj_mask=jnp.ones(N), triple_mask=jnp.ones(T))

    box_p = np.concatenate([box, rng.normal(size=(pad_n, 8)).astype(np.float32)])
    obj_p = np.concatenate([obj, rng.normal(size=(pad_n, 24)).astype(np.float32)])
    tri_p = np.concatenate([tri, np.stack(
        [rng.integers(0, N, pad_t), rng.integers(0, 16, pad_t),
         rng.integers(0, N, pad_t)], 1).astype(np.int32)])
    t_p = np.concatenate([t, rng.integers(0, 1000, pad_n).astype(np.int32)])
    om = np.concatenate([np.ones(N), np.zeros(pad_n)]).astype(np.float32)
    tm = np.concatenate([np.ones(T), np.zeros(pad_t)]).astype(np.float32)
    out_p = model.apply(vars_, jnp.asarray(box_p), jnp.asarray(obj_p),
                        jnp.asarray(tri_p), jnp.asarray(t_p),
                        obj_mask=jnp.asarray(om), triple_mask=jnp.asarray(tm))
    assert np.allclose(np.asarray(out)[:N], np.asarray(out_p)[:N], atol=1e-5)


def test_shape_denoiser_shapes(rng):
    M, T, R = 4, 6, 8
    x = jnp.asarray(rng.normal(size=(M, R, R, R, 3)).astype(np.float32))
    obj = jnp.asarray(rng.normal(size=(M, 1, 48)).astype(np.float32))
    tri = jnp.asarray(np.stack([rng.integers(0, M, T), rng.integers(0, 16, T),
                                rng.integers(0, M, T)], 1).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 1000, M).astype(np.int32))
    model = ShapeDenoiser(image_size=R, model_channels=16, num_res_blocks=1,
                          channel_mult=(1, 2), attention_resolutions=(2,),
                          num_heads=4, context_dim=48, gconv_dim=8,
                          gconv_num_layers=2, conditioning_key="crossattn")
    vars_ = model.init(jax.random.PRNGKey(0), x, obj, tri, t)
    out = model.apply(vars_, x, obj, tri, t)
    assert out.shape == (M, R, R, R, 3)
    assert np.allclose(np.asarray(out), 0.0)  # zero-init head


def test_vqvae_roundtrip_shapes(rng):
    B, R = 2, 16   # tiny resolution for test speed; 2 downs -> 4^3 latent
    x = jnp.asarray(rng.normal(size=(B, R, R, R, 1)).astype(np.float32))
    vq = VQVAE(ch=8, ch_mult=(1, 2), n_embed=32, embed_dim=3, z_channels=3,
               resolution=R)
    # init the FULL graph (encoder + quantizer + decoder params)
    vars_ = vq.init(jax.random.PRNGKey(0), x)
    z = vq.apply(vars_, x, forward_no_quant=True, encode_only=True)
    assert z.shape == (B, R // 2, R // 2, R // 2, 3)
    dec = vq.apply(vars_, z, method=VQVAE.decode_no_quant)
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
