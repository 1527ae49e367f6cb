"""Shared UNet building blocks (timestep embedding, norm, res blocks, resampling).

Behavioral reference: /root/reference/model/networks/diffusion_shape/
openai_model_3d.py:100-314 and ldm_diffusion_util.py:174-273.  Everything here
is channel-LAST (TPU-native: NHWC / NDHWC / NLC), unlike the torch reference's
channel-first layout — convolutions then map directly onto XLA's preferred
layouts and the MXU.

Spatial-rank convention: `x` is (B, *spatial, C) with spatial rank 1, 2 or 3.
The 3D UNet resamples only the inner two spatial dims (matching
openai_model_3d.py:149-155, 188: stride (1,2,2)); the 1D path resamples
nothing (denoise_net.py:154 interpolates with scale_factor=1 — the layout
token keeps length 1).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quant import ScopedInt8Conv, act_dtype, is_int8


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings, cos-first ordering (ldm_diffusion_util.py:174-194).

    timesteps: (B,) int or float -> (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def group_norm_fast(x: jnp.ndarray, groups: int, epsilon: float,
                    scale: jnp.ndarray, bias: jnp.ndarray,
                    shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Channel-last GroupNorm with TPU-friendly reductions.

    The naive formulation reshapes to (..., G, C/G) and reduces over a tiny
    minor dim (C/G = 7 for C=224) — catastrophic lane utilisation (profiled
    at >50% of the whole UNet3D forward).  Here the reductions run over the
    SPATIAL axes with C kept minor (fully laned), then group aggregation
    happens on the tiny (B, C) moment arrays.  Statistics in f32; one fused
    elementwise normalise pass in the input dtype.

    `shift`, a per-(B, C) channel bias, computes GN(x + shift) WITHOUT
    materialising x + shift: constant over space, it moves the moments
    analytically (E[(x+s)] = E[x] + s; E[(x+s)^2] = E[x^2] + 2 s E[x] + s^2)
    and folds back into the output affine.  This is the ResBlock
    time-embedding add — skipping the materialisation saves a full HBM
    write+read of the activation per ResBlock on both train and sample
    paths (the value is bit-equivalent up to f32 summation order).
    """
    *lead, c = x.shape
    b = x.shape[0]
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=spatial_axes)            # (B, C)
    s2 = jnp.sum(xf * xf, axis=spatial_axes)       # (B, C)
    if shift is not None:
        sh = shift.reshape(b, c).astype(jnp.float32)
        s2 = s2 + 2.0 * sh * s1 + n_spatial * sh * sh
        s1 = s1 + n_spatial * sh
    cg = c // groups
    n = n_spatial * cg
    s1g = s1.reshape(b, groups, cg).sum(-1)        # (B, G)
    s2g = s2.reshape(b, groups, cg).sum(-1)
    mean = s1g / n
    var = jnp.maximum(s2g / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + epsilon)             # (B, G)
    # per-channel affine folded into the group stats -> ONE elementwise pass
    mean_c = jnp.repeat(mean, cg, axis=1)          # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    w = inv_c * scale[None, :]                     # (B, C)
    b_ = bias[None, :] - mean_c * w
    if shift is not None:
        b_ = b_ + sh * w
    shape = (b,) + (1,) * len(spatial_axes) + (c,)
    return (xf * w.reshape(shape) + b_.reshape(shape)).astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 (ldm_diffusion_util.py:222-239).

    All reference channel counts are multiples of 32; for smaller test-scale
    widths the group count degrades to the largest divisor <= requested.
    """
    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, shift=None):
        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:
            groups -= 1
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_fast(x, groups, self.epsilon, scale, bias,
                               shift=shift)


def zero_init_conv(features: int, kernel: Sequence[int], **kw) -> nn.Conv:
    """Conv whose weights AND bias start at zero (zero_module, util:197-203)."""
    return nn.Conv(features, kernel_size=tuple(kernel),
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros, **kw)


def factored_upsample_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: Optional[jnp.ndarray],
                           up_axes: Tuple[int, ...],
                           quantized: bool = False) -> jnp.ndarray:
    """nearest-2x upsample on `up_axes` + SAME 3^r conv, computed EXACTLY as
    2^len(up_axes) small-kernel convolutions on the pre-upsample grid.

    conv3d(repeat2(x)) reads each input voxel through duplicated neighbours:
    output position 2i+r along an upsampled axis touches only input rows
    {i-1, i} (r=0, taps [W0, W1+W2]) or {i, i+1} (r=1, taps [W0+W1, W2]), so
    the 3-tap dim collapses to 2 taps per output parity.  MACs drop 27/12 =
    2.25x for the UNet's (H, W) upsample and 27/8 = 3.375x for the VQ-VAE
    decoder's full-3D upsample, and the 2x/8x `repeat` tensor is never
    materialised.  Measured on v5e at the shape-UNet sites: 15.1 -> 8.9 ms
    (16,8,8)x448 and 8.4 -> 4.4 ms (16,4,4)x672 per upsample+conv.

    x: (B, *spatial, C); kernel: (3,)*rank + (C, K); up_axes: x-axis indices
    (spatial positions) that get upsampled.  Exact vs repeat+conv to f32
    rounding (weight taps are pre-summed once; tested in test_nn_modules).

    Behavioral reference: openai_model_3d.py:148-157 (F.interpolate nearest
    2x on the inner dims + conv) and vqvae_modules.py:24-39 (all dims).
    """
    rank = x.ndim - 2
    spatial_axes = tuple(range(1, 1 + rank))
    parities = [()]
    for _ in up_axes:
        parities = [p + (r,) for p in parities for r in (0, 1)]

    def sub_kernel(parity):
        wk = kernel
        for ax_i, r in zip(up_axes, parity):
            kdim = ax_i - 1                     # kernel dim for this axis
            w0 = jax.lax.index_in_dim(wk, 0, kdim, keepdims=False)
            w1 = jax.lax.index_in_dim(wk, 1, kdim, keepdims=False)
            w2 = jax.lax.index_in_dim(wk, 2, kdim, keepdims=False)
            pair = (w0, w1 + w2) if r == 0 else (w0 + w1, w2)
            wk = jnp.stack(pair, axis=kdim)
        return wk

    def sub_pads(parity):
        pads = []
        it = dict(zip(up_axes, parity))
        for ax in spatial_axes:
            if ax in it:
                pads.append((1, 0) if it[ax] == 0 else (0, 1))
            else:
                pads.append((1, 1))
        return pads

    dn = {1: ("NLC", "LIO", "NLC"), 2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[rank]
    if quantized:
        from .quant import quantize_symmetric
        xq, x_scale = quantize_symmetric(x, axes=None)
        out_dtype = jnp.bfloat16
    outs = []
    for parity in parities:
        wk = sub_kernel(parity)
        if quantized:
            # W8A8 like Int8Conv: per-out-channel weight scales on the
            # pre-summed 2-tap sub-kernels, int32 accumulation
            wq, w_scale = quantize_symmetric(wk, axes=tuple(range(wk.ndim - 1)))
            y = jax.lax.conv_general_dilated(
                xq, wq, (1,) * rank, sub_pads(parity),
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            deq = (x_scale.reshape(()) *
                   w_scale.reshape((1,) * (y.ndim - 1) + (wk.shape[-1],)))
            y = (y.astype(jnp.float32) * deq).astype(out_dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x, wk, (1,) * rank, sub_pads(parity),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(x.dtype)
        outs.append(y)

    # interleave the parity grids: place each parity axis after its spatial
    # axis, then merge — one XLA transpose over the output
    n = len(up_axes)
    y = jnp.stack(outs, axis=x.ndim - 1)         # (B, *spatial, 2^n, K)
    y = y.reshape(y.shape[:x.ndim - 1] + (2,) * n + y.shape[-1:])
    perm = list(range(1 + rank))                 # B + spatial
    for i, ax in enumerate(sorted(up_axes)):
        perm.insert(perm.index(ax) + 1, 1 + rank + i)
    perm.append(1 + rank + n)                    # K last
    y = y.transpose(*perm)
    shape = [y.shape[0]]
    for ax in spatial_axes:
        shape.append(x.shape[ax] * (2 if ax in up_axes else 1))
    shape.append(y.shape[-1])
    y = y.reshape(shape)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return y


class FactoredUpsampleConv(nn.Module):
    """Parameter-compatible nn.Conv replacement for the repeat2+conv pattern
    (same 'kernel' (3,..,C,K) / 'bias' (K,) params, same init), computing
    the upsample+conv via `factored_upsample_conv`."""
    features: int
    spatial_rank: int
    up_axes: Tuple[int, ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kshape = (3,) * self.spatial_rank + (c, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if is_int8(self.dtype):
            return factored_upsample_conv(x.astype(jnp.bfloat16), kernel,
                                          bias, self.up_axes, quantized=True)
        adt = act_dtype(self.dtype) or x.dtype
        return factored_upsample_conv(x.astype(adt), kernel.astype(adt),
                                      bias, self.up_axes)


# lands in the same 'Conv_i' flax scopes as the nn.Conv it replaces so one
# param tree serves both implementations (same pattern as ScopedInt8Conv)
ScopedFactoredUpsampleConv = type(
    "Conv", (FactoredUpsampleConv,),
    {"__doc__": "FactoredUpsampleConv under the 'Conv' flax scope name."})


class WinogradConv3d(nn.Module):
    """Parameter-compatible nn.Conv replacement computing the stride-1 SAME
    3x3x3 convolution via Winograd F(2,3)^3 (kernels/winograd.py): 3.375x
    fewer MACs, all stages MXU matmuls.  Same param names/shapes/init as
    nn.Conv ('kernel' (3,3,3,C,K), 'bias' (K,)) so one param tree serves
    both implementations.  Spatial dims must be even (all UNet3D levels are:
    16/8/4); sampling-path only (no special backward)."""
    features: int
    zero: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..kernels.winograd import winograd_conv3d
        c = x.shape[-1]
        init_k = (nn.initializers.zeros if self.zero
                  else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init_k, (3, 3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        adt = act_dtype(self.dtype) or x.dtype
        return winograd_conv3d(x.astype(adt), kernel, bias)


# flax auto-names unnamed submodules from the class name; the Winograd conv
# substitutes for nn.Conv so it must land in the same 'Conv_i' scopes for the
# shared param tree to resolve (same pattern as quant.ScopedInt8Conv)
ScopedWinogradConv = type(
    "Conv", (WinogradConv3d,),
    {"__doc__": "WinogradConv3d under the 'Conv' flax scope name."})


def _conv(features: int, spatial_rank: int, stride=1, kernel: int = 3,
          zero: bool = False, dtype=None, name=None,
          winograd: bool = False) -> nn.Module:
    ks = (kernel,) * spatial_rank
    strides = stride if isinstance(stride, tuple) else (stride,) * spatial_rank
    padding = [(kernel // 2, kernel // 2)] * spatial_rank
    init = {}
    if zero:
        init = dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
    if is_int8(dtype):
        # opt-in W8A8 sampling mode: parameter-compatible quantized conv
        return ScopedInt8Conv(features=features, kernel_size=ks,
                              strides=strides, padding=padding, name=name,
                              **init)
    if (winograd and spatial_rank == 3 and kernel == 3
            and strides == (1, 1, 1)):
        return ScopedWinogradConv(features=features, zero=zero, dtype=dtype,
                                  name=name)
    return nn.Conv(features, kernel_size=ks, strides=strides,
                   padding=padding, dtype=dtype, name=name, **init)


class Upsample(nn.Module):
    """Nearest-2x upsample of the inner two dims (3D) / identity (1D) + conv.

    3D: openai_model_3d.py:148-157 — (D, H, W) -> (D, 2H, 2W).
    1D: denoise_net.py:147-157 — interpolate(scale_factor=1) is identity.
    """
    channels: int
    spatial_rank: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None
    winograd: bool = False
    factored: bool = False    # SAMPLING-ONLY exact factored upsample+conv

    @nn.compact
    def __call__(self, x):
        # factored path: the repeat2+conv pair computed exactly as 4
        # two-tap-per-upsampled-dim convs on the pre-upsample grid (2.25x
        # fewer MACs, no repeat tensor; see factored_upsample_conv); under
        # the int8 sentinel the sub-convs run W8A8 like Int8Conv.
        # INFERENCE-ONLY: the backward through the asymmetric-pad sub-convs
        # + interleave measured 2.2x SLOWER than repeat+conv's (train step
        # 194.6 -> 421 ms), so the flag is set only on the no-backward twin.
        import os as _os
        if (self.spatial_rank == 3 and self.use_conv and self.factored
                and not self.winograd
                and not _os.environ.get("ECHOSCENE_NO_FACTORED_UP")):
            return ScopedFactoredUpsampleConv(
                features=self.channels, spatial_rank=3, up_axes=(2, 3),
                dtype=self.dtype)(x)
        if self.spatial_rank == 3:
            b, d, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        elif self.spatial_rank == 2:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        # rank 1: identity (reference quirk, denoise_net.py:154)
        if self.use_conv:
            x = _conv(self.channels, self.spatial_rank, dtype=self.dtype,
                      winograd=self.winograd)(x)
        return x


class Downsample(nn.Module):
    """Strided conv downsample; 3D strides only the inner two dims.

    openai_model_3d.py:173-199: stride (1,2,2) for 3D, 2 otherwise.
    """
    channels: int
    spatial_rank: int
    use_conv: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.spatial_rank == 3:
            stride: Tuple[int, ...] = (1, 2, 2)
        else:
            stride = (2,) * self.spatial_rank
        if self.use_conv:
            return _conv(self.channels, self.spatial_rank, stride=stride,
                         dtype=self.dtype)(x)
        return nn.avg_pool(x, window_shape=stride, strides=stride)


class ResBlock(nn.Module):
    """GN-SiLU-conv / time-emb add / GN-SiLU-zeroconv + skip (openai_model_3d.py:202-314)."""
    channels: int
    out_channels: Optional[int] = None
    spatial_rank: int = 3
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    winograd: bool = False    # sampling-only Winograd F(2,3)^3 3x3x3 convs
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        out_ch = self.out_channels or self.channels
        h = GroupNorm32()(x)
        h = nn.silu(h)
        h = _conv(out_ch, self.spatial_rank, dtype=self.dtype,
                  winograd=self.winograd)(h)

        emb_out = nn.Dense(2 * out_ch if self.use_scale_shift_norm else out_ch,
                           dtype=act_dtype(self.dtype))(nn.silu(emb))
        emb_out = emb_out.reshape(emb_out.shape[0],
                                  *(1,) * self.spatial_rank, emb_out.shape[-1])
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            # GN(h + emb) via the analytic channel-shift (group_norm_fast
            # docstring): h + emb is never materialised in HBM
            h = GroupNorm32()(h, shift=emb_out)
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(out_ch, self.spatial_rank, zero=True, dtype=self.dtype,
                  winograd=self.winograd)(h)

        if out_ch == self.channels:
            skip = x
        else:
            skip = _conv(out_ch, self.spatial_rank, kernel=1, dtype=self.dtype)(x)
        return skip + h
