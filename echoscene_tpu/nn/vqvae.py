"""3D VQ-VAE over 64^3 SDF grids (taming-transformers family), channel-last.

Behavioral reference: /root/reference/model/networks/vqvae_networks/
{network.py, vqvae_modules.py, quantizer.py}.  Structure preserved:
  * Encoder3D: conv_in -> [res x N (+attn at listed res) -> asym-pad stride-2
    downsample] per ch_mult level -> mid(res, attn, res) -> norm -> act ->
    conv_out (vqvae_modules.py:181-290); 64^3 -> 16^3 with ch_mult (1,2,4),
  * Decoder3D mirrors with nearest-2x upsampling (vqvae_modules.py:292-409),
  * VectorQuantizer: L2-nearest codebook lookup + straight-through estimator,
    non-legacy loss ordering with beta on the encoder-commitment term
    (quantizer.py:68-119; network.py:68-69 uses beta=1.0, legacy=False),
  * the diffusion-facing API is pre-quantisation: encode_no_quant /
    decode_no_quant (network.py:84-103).

GroupNorm group-count quirk (vqvae_modules.py:13-21): channels <= 32 use C//4
groups; channels not divisible by 32 use 30 groups; eps 1e-6.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..kernels.attention import dot_product_attention
from .blocks import group_norm_fast


class _VQGroupNorm(nn.Module):
    """GroupNorm with the taming group-count quirk, on the lane-friendly
    fast path (see nn/blocks.py group_norm_fast)."""
    groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_fast(x, self.groups, self.epsilon, scale, bias)


def _norm(c: int) -> nn.Module:
    groups = 32
    if c <= 32:
        groups = c // 4
    elif c % 32 != 0:
        groups = 30
    return _VQGroupNorm(groups)


def swish(x):
    return x * nn.sigmoid(x)


class ResnetBlock3D(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in
        h = _norm(c_in)(x)
        h = swish(h)
        h = nn.Conv(c_out, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        h = _norm(c_out)(h)
        h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(c_out, (3, 3, 3), padding=1, dtype=self.dtype)(h)
        if c_in != c_out:
            x = nn.Conv(c_out, (1, 1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock3D(nn.Module):
    """Full self-attention over all voxels (vqvae_modules.py:126-178)."""
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        y = _norm(c)(x)
        q = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="q")(y)
        k = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="k")(y)
        v = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="v")(y)
        toks = lambda a: a.reshape(b, d * h * w, 1, c)   # single head
        out = dot_product_attention(toks(q), toks(k), toks(v))
        out = out.reshape(b, d, h, w, c)
        out = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample3D(nn.Module):
    """Asymmetric right-pad + stride-2 conv (vqvae_modules.py:42-61)."""
    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3, 3), strides=(2, 2, 2),
                       padding=[(0, 1), (0, 1), (0, 1)], dtype=self.dtype)(x)


class Upsample3D(nn.Module):
    """Nearest 2x in all three dims + conv (vqvae_modules.py:24-39).

    `factored=True` (SAMPLING-ONLY: the factored form's backward measured
    slower than repeat+conv's) computes the pair exactly as 8 (2,2,2)-tap
    convs on the pre-upsample grid — 3.375x fewer MACs, no 8x repeat tensor
    (blocks.factored_upsample_conv); params stay nn.Conv-shaped either way.
    """
    channels: int
    dtype: Optional[jnp.dtype] = None
    factored: bool = False

    @nn.compact
    def __call__(self, x):
        import os
        if self.factored and not os.environ.get("ECHOSCENE_NO_FACTORED_UP"):
            from .blocks import ScopedFactoredUpsampleConv
            return ScopedFactoredUpsampleConv(
                features=self.channels, spatial_rank=3, up_axes=(1, 2, 3),
                dtype=self.dtype)(x)
        for axis in (1, 2, 3):
            x = jnp.repeat(x, 2, axis=axis)
        return nn.Conv(self.channels, (3, 3, 3), padding=1,
                       dtype=self.dtype)(x)


def _act(name: str):
    # torch nn.GELU is the exact erf form; jax defaults to the tanh approx
    exact_gelu = lambda x: nn.gelu(x, approximate=False)
    return {"gelu": exact_gelu, "swish": swish, "lrelu": nn.leaky_relu}[name]


class Encoder3D(nn.Module):
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 3
    resolution: int = 64
    double_z: bool = False
    dropout: float = 0.0
    activ: str = "gelu"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Conv(self.ch, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock3D(self.ch * mult, self.dropout, self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(
                                      h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock3D(self.dtype,
                                    name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample3D(h.shape[-1], self.dtype,
                                 name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock3D(dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic)
        h = AttnBlock3D(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock3D(dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic)
        h = _norm(h.shape[-1])(h)
        h = _act(self.activ)(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder3D(nn.Module):
    ch: int = 64
    out_ch: int = 1
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    resolution: int = 64
    dropout: float = 0.0
    activ: str = "gelu"
    dtype: Optional[jnp.dtype] = None
    factored_upsample: bool = False

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)
        h = nn.Conv(block_in, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock3D(dtype=self.dtype, name="mid_block_1")(
            h, deterministic=deterministic)
        h = AttnBlock3D(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock3D(dtype=self.dtype, name="mid_block_2")(
            h, deterministic=deterministic)
        for i_level in reversed(range(num_levels)):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock3D(self.ch * self.ch_mult[i_level], self.dropout,
                                  self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(
                                      h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock3D(self.dtype,
                                    name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample3D(h.shape[-1], self.dtype,
                               factored=self.factored_upsample,
                               name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = _norm(h.shape[-1])(h)
        h = _act(self.activ)(h)
        return nn.Conv(self.out_ch, (3, 3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """L2-nearest codebook with straight-through gradients (quantizer.py:10-119)."""
    n_embed: int = 8192
    embed_dim: int = 3
    beta: float = 1.0

    @nn.compact
    def __call__(self, z) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """z: (..., embed_dim) channel-last. Returns (z_q, loss, indices)."""
        def _uniform_pm(key, shape):
            # torch nn.Embedding uniform_(-1/n, 1/n) (quantizer.py:27)
            lim = 1.0 / self.n_embed
            return jax.random.uniform(key, shape, minval=-lim, maxval=lim)

        book = self.param("embedding", _uniform_pm,
                          (self.n_embed, self.embed_dim))

        flat = z.reshape(-1, self.embed_dim)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             + jnp.sum(book ** 2, axis=1)[None, :]
             - 2.0 * jnp.einsum("nd,kd->nk", flat, book,
                                preferred_element_type=jnp.float32))
        idx = jnp.argmin(d, axis=1)
        z_q = book[idx].reshape(z.shape)
        # non-legacy loss (quantizer.py:90-92): beta * ||sg[z_q] - z||^2 + ||z_q - sg[z]||^2
        loss = (self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
                + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2))
        z_q = z + jax.lax.stop_gradient(z_q - z)   # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])


class VQVAE(nn.Module):
    """VQ-VAE facade with the reference's pre-quant diffusion API
    (network.py:51-141)."""
    n_embed: int = 8192
    embed_dim: int = 3
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    attn_resolutions: Sequence[int] = ()
    in_channels: int = 1
    out_ch: int = 1
    z_channels: int = 3
    resolution: int = 64
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    factored_upsample: bool = False   # sampling-only (see Upsample3D)

    def setup(self):
        self.encoder = Encoder3D(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, z_channels=self.z_channels,
            resolution=self.resolution, dropout=self.dropout, dtype=self.dtype)
        self.decoder = Decoder3D(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            dropout=self.dropout, dtype=self.dtype,
            factored_upsample=self.factored_upsample)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1, 1), dtype=self.dtype)

    def encode_no_quant(self, x, *, deterministic: bool = True):
        """x: (B, 64, 64, 64, 1) -> pre-quant latent (B, 16, 16, 16, 3)."""
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode_no_quant(self, h, *, force_not_quantize: bool = False,
                        deterministic: bool = True):
        if not force_not_quantize:
            h, _, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(h), deterministic=deterministic)

    def encode(self, x, *, deterministic: bool = True):
        h = self.encode_no_quant(x, deterministic=deterministic)
        return self.quantize(h)

    def decode(self, quant, *, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(quant),
                            deterministic=deterministic)

    def __call__(self, x, *, forward_no_quant: bool = False,
                 encode_only: bool = False, deterministic: bool = True):
        if forward_no_quant:
            z = self.encode_no_quant(x, deterministic=deterministic)
            if encode_only:
                return z
            dec = self.decode_no_quant(z, deterministic=deterministic)
            return dec, z
        quant, diff, _ = self.encode(x, deterministic=deterministic)
        dec = self.decode(quant, deterministic=deterministic)
        return dec, diff
