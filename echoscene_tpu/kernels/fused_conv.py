"""Fused GroupNorm-affine + SiLU + 3x3x3 conv (+bias/residual) Pallas kernel.

Sampling-path replacement for the shape UNet's ResBlock pattern
(reference: openai_model_3d.py:202-314 — GN -> SiLU -> conv3d -> (+emb) ->
GN -> SiLU -> conv3d -> +skip).  The GroupNorm statistics are reduced to a
per-(B, C) affine (w, b) OUTSIDE the kernel (one cheap XLA reduction — see
`group_norm_affine`); the kernel then computes

    y = conv3d(silu(x * w + b), W) [+ bias] [+ residual]

in ONE pass over HBM: the normalize/activation/bias/residual elementwise
passes all happen on VMEM-resident tiles, and the 27-tap conv runs as MXU
matmuls accumulated in f32.  Halos are handled by static valid-region
slicing per tap (no padded copy of x in HBM).

Forward-only (generation has no backward); training keeps the flax path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def group_norm_affine(x: jnp.ndarray, groups: int, eps: float,
                      scale: jnp.ndarray, bias: jnp.ndarray,
                      shift: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(B, C) affine (w, b) such that GN(x [+ shift]) == x*w + b.

    Same math as nn.blocks.group_norm_fast but returning the folded affine
    instead of applying it.  `shift` is an optional per-(B, C) channel bias
    added BEFORE normalization (the ResBlock's time-embedding add): since it
    is constant over space, the group moments shift analytically —
    E[(x+s)^2] = E[x^2] + 2 s E[x] + s^2 per channel — so the add never
    touches the (B, D, H, W, C) tensor.  The returned b already folds the
    shift back in (x*w + b == GN(x + shift)).
    """
    b_, c = x.shape[0], x.shape[-1]
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = int(np.prod([x.shape[a] for a in spatial_axes]))
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=spatial_axes)            # (B, C)
    s2 = jnp.sum(xf * xf, axis=spatial_axes)       # (B, C)
    if shift is not None:
        sh = shift.astype(jnp.float32)
        s2 = s2 + 2.0 * sh * s1 + n_spatial * sh * sh
        s1 = s1 + n_spatial * sh
    cg = c // groups
    n = n_spatial * cg
    mean = s1.reshape(b_, groups, cg).sum(-1) / n          # (B, G)
    ex2 = s2.reshape(b_, groups, cg).sum(-1) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)                         # (B, G)
    mean_c = jnp.repeat(mean, cg, axis=1)                  # (B, C)
    inv_c = jnp.repeat(inv, cg, axis=1)
    w = inv_c * scale[None, :].astype(jnp.float32)
    b_out = bias[None, :].astype(jnp.float32) - mean_c * w
    if shift is not None:
        b_out = b_out + shift.astype(jnp.float32) * w
    return w, b_out


def _pick_tiles(v: int, cin: int, cout: int) -> Tuple[int, int]:
    """(TK, TN) channel tile sizes bounded by VMEM (weights 27*TK*TN bf16
    double-buffered + x block + f32 accumulator must fit in ~16 MB)."""
    def fits(tk, tn):
        w_bytes = 27 * tk * tn * 2 * 2          # double-buffered bf16
        x_bytes = v * tk * 2 * 2
        acc_bytes = v * tn * 4
        out_bytes = v * tn * 2 * 2
        return w_bytes + x_bytes + acc_bytes + out_bytes < 13 * 1024 * 1024

    divisors = lambda c, cap: [d for d in range(1, min(c, cap) + 1)
                               if c % d == 0]
    tn = divisors(cout, 256)[-1]
    for tk in reversed(divisors(cin, cin)):
        if fits(tk, tn):
            return tk, tn
    return 1, tn


def _conv_kernel(x_ref, w_ref, gnw_ref, gnb_ref, bias_ref, res_ref, out_ref,
                 acc_ref, *, D, H, W, TK, TN, n_k, activate, has_residual,
                 out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0].astype(jnp.float32)                      # (D, H, W, TK)
    if activate:
        xa = xb * gnw_ref[0][None, None, None, :] + \
            gnb_ref[0][None, None, None, :]
        xa = xa * jax.nn.sigmoid(xa)
    else:
        xa = xb
    xa = xa.astype(jnp.bfloat16)

    for tap in range(27):
        od, oh, ow = tap // 9 - 1, (tap // 3) % 3 - 1, tap % 3 - 1
        # valid output region for this tap offset: out[v] += x[v + o]
        d0, d1 = max(0, -od), D - max(0, od)
        h0, h1 = max(0, -oh), H - max(0, oh)
        w0, w1 = max(0, -ow), W - max(0, ow)
        xs = xa[d0 + od:d1 + od, h0 + oh:h1 + oh, w0 + ow:w1 + ow, :]
        dd, hh, ww = d1 - d0, h1 - h0, w1 - w0
        contrib = jax.lax.dot_general(
            xs.reshape(dd * hh * ww, TK), w_ref[tap],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(dd, hh, ww, TN)
        acc_ref[d0:d1, h0:h1, w0:w1, :] += contrib

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[...] + bias_ref[0][None, None, None, :]
        if has_residual:
            y = y + res_ref[0].astype(jnp.float32)
        out_ref[0] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("activate", "interpret"))
def conv3d_gn_silu(x: jnp.ndarray, gn_w: jnp.ndarray, gn_b: jnp.ndarray,
                   kernel: jnp.ndarray, bias: jnp.ndarray,
                   residual: Optional[jnp.ndarray] = None,
                   activate: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """y = conv3d(silu(x * gn_w + gn_b), kernel) + bias [+ residual].

    x:        (B, D, H, W, Cin)   bf16/f32
    gn_w/b:   (B, Cin)            f32 folded GroupNorm affine
    kernel:   (3, 3, 3, Cin, Cout) (flax Conv layout, SAME padding, stride 1)
    bias:     (Cout,)
    residual: optional (B, D, H, W, Cout) added to the conv output
    Output dtype: bfloat16 (the sampling compute dtype).
    """
    B, D, H, W, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    out_dtype = jnp.bfloat16
    tk, tn = _pick_tiles(D * H * W, cin, cout)
    n_k, n_j = cin // tk, cout // tn
    w27 = kernel.astype(jnp.bfloat16).reshape(27, cin, cout)

    has_res = residual is not None
    res = residual if has_res else jnp.zeros((B, 1, 1, 1, tn), out_dtype)

    body = functools.partial(
        _conv_kernel, D=D, H=H, W=W, TK=tk, TN=tn, n_k=n_k,
        activate=activate, has_residual=has_res, out_dtype=out_dtype)

    return pl.pallas_call(
        body,
        grid=(B, n_j, n_k),
        in_specs=[
            pl.BlockSpec((1, D, H, W, tk), lambda b, j, k: (b, 0, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, tk, tn), lambda b, j, k: (0, k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda b, j, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda b, j, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda b, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, D, H, W, tn), lambda b, j, k: (b, 0, 0, 0, j),
                          memory_space=pltpu.VMEM) if has_res else
             pl.BlockSpec((1, 1, 1, 1, tn), lambda b, j, k: (0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((1, D, H, W, tn),
                               lambda b, j, k: (b, 0, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((D, H, W, tn), jnp.float32)],
        interpret=interpret,
    )(x, w27, gn_w.astype(jnp.float32), gn_b.astype(jnp.float32),
      bias.astype(jnp.float32).reshape(1, cout), res)


def conv3d_gn_silu_reference(x, gn_w, gn_b, kernel, bias, residual=None,
                             activate=True):
    """Pure-XLA reference for parity tests."""
    xf = x.astype(jnp.float32)
    if activate:
        sh = (x.shape[0],) + (1,) * 3 + (x.shape[-1],)
        xa = xf * gn_w.reshape(sh) + gn_b.reshape(sh)
        xa = xa * jax.nn.sigmoid(xa)
    else:
        xa = xf
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        xa.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32).reshape(1, 1, 1, 1, -1)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(jnp.bfloat16)
