"""Fused GroupNorm-affine + SiLU + 3x3x3 conv (+bias/residual) Pallas kernel.

Sampling-path replacement for the shape UNet's ResBlock pattern
(reference: openai_model_3d.py:202-314 — GN -> SiLU -> conv3d -> (+emb) ->
GN -> SiLU -> conv3d -> +skip).  The GroupNorm statistics are reduced to a
per-(B, C) affine (w, b) OUTSIDE the kernel (one cheap XLA reduction — see
`group_norm_affine`); the kernel then computes

    y = conv3d(silu(x * w + b), W) [+ bias] [+ residual]

in ONE pass over HBM: the normalize/activation/bias/residual elementwise
passes all happen on VMEM-resident tiles, and the 27-tap conv runs as MXU
matmuls accumulated in f32.  Halos are handled by an H/W zero-pad of x so
each tap is a flat row-offset slice of the flattened activation.

STATUS — experimental, OFF by default (ECHOSCENE_FUSED_CONV=1 to enable):
measured on v5e, the original shifted-window form lost 7.8x to XLA's conv
emitter (27 per-tap VMEM relayouts dominated), and this flat-offset form
both compiles pathologically slowly under Mosaic (>14 min for the flagship
16^3x224 shape) and pays (H+2)(W+2)/(HW) padded-MAC overhead — 27% at the
16^3 level, 56% at (16,8,8), 125% at (16,4,4) — which exceeds the ~2 HBM
elementwise passes the fusion saves.  XLA's conv (127 TFLOP/s measured,
64% of v5e bf16 peak) plus its own producer fusion is the faster path;
kept for interpret-mode-tested reference and future toolchains.

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


def _round128(c: int) -> int:
    return -(-c // 128) * 128


def _pick_tiles(v_out: int, v_pad: int, cinp: int, coutp: int
                ) -> Tuple[int, int]:
    """(TK, TN) channel tile sizes over the 128-PADDED channel dims.

    Pallas TPU requires the last block dim to be a multiple of 128 (or the
    full array dim); channels are padded to 128 multiples by the caller, so
    tiles are 128-aligned divisors bounded by VMEM (double-buffered weights
    + H/W-padded x chunk + flat f32 accumulator + output block must fit)."""
    def fits(tk, tn):
        w_bytes = 27 * tk * tn * 2 * 2          # double-buffered bf16
        x_bytes = v_pad * tk * 2 * 2
        acc_bytes = v_pad * tn * 4
        out_bytes = v_out * tn * 2 * 2
        res_bytes = v_out * tn * 2 * 2
        stack_bytes = v_pad * tk * 6            # activation temporaries
        return (w_bytes + x_bytes + acc_bytes + out_bytes + res_bytes
                + stack_bytes) < 14 * 1024 * 1024

    cands_n = [d for d in range(128, coutp + 1, 128) if coutp % d == 0]
    cands_k = [d for d in range(128, cinp + 1, 128) if cinp % d == 0]
    for tn in reversed(cands_n):
        for tk in reversed(cands_k):
            if fits(tk, tn):
                return tk, tn
    return 128, 128


def _conv_kernel(x_ref, w_ref, gnw_ref, gnb_ref, bias_ref, res_ref, out_ref,
                 acc_ref, *, D, H, W, TK, TN, n_k, activate, has_residual,
                 out_dtype):
    """x_ref block is spatially H/W-padded: (1, D, H+2, W+2, TK).

    The 27 taps run as CONTIGUOUS row-slice matmuls over the flattened
    (D*(H+2)*(W+2), TK) activation: with zero padding on H/W, a tap offset
    (od, oh, ow) is the single flat row offset od*Hp*Wp + oh*Wp + ow —
    H/W border wraps land in the padding rows (sliced off at the end), and
    D border rows are trimmed by the slice bounds.  This costs
    Hp*Wp/(H*W) extra MACs but avoids any per-tap relayout (the naive
    shifted-window formulation spent ~8x the matmul time on VPU copies).
    """
    k = pl.program_id(2)
    Hp, Wp = H + 2, W + 2
    R = D * Hp * Wp

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[0].astype(jnp.float32)                      # (D, Hp, Wp, TK)
    if activate:
        xa = xb * gnw_ref[0, 0][None, None, None, :] + \
            gnb_ref[0, 0][None, None, None, :]
        xa = xa * jax.nn.sigmoid(xa)
        # padding rows must stay zero after the affine (their gn bias is
        # real): silu(b) != 0 — mask them back out so they contribute
        # nothing to the conv
        hh = jax.lax.broadcasted_iota(jnp.int32, (D, Hp, Wp, 1), 1)
        ww = jax.lax.broadcasted_iota(jnp.int32, (D, Hp, Wp, 1), 2)
        interior = ((hh >= 1) & (hh <= H) & (ww >= 1) & (ww <= W))
        xa = jnp.where(interior, xa, 0.0)
    else:
        xa = xb
    xa_flat = xa.astype(jnp.bfloat16).reshape(R, TK)       # one relayout

    for tap in range(27):
        od, oh, ow = tap // 9 - 1, (tap // 3) % 3 - 1, tap % 3 - 1
        off = od * Hp * Wp + oh * Wp + ow
        r0, r1 = max(0, -off), R - max(0, off)
        contrib = jax.lax.dot_general(
            xa_flat[r0 + off:r1 + off], w_ref[tap],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[r0:r1, :] += contrib

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[...].reshape(D, Hp, Wp, TN)[:, 1:H + 1, 1:W + 1, :]
        y = y + bias_ref[0, 0][None, None, None, :]
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

    # pad channels to 128 multiples (Pallas TPU lane-dim block constraint;
    # the MXU pads to this granularity internally anyway).  Padded input
    # channels carry zero gn affine -> silu(0)=0 -> contribute nothing;
    # padded output channels are sliced off.
    cinp, coutp = _round128(cin), _round128(cout)
    Hp, Wp = H + 2, W + 2
    x = x.astype(jnp.bfloat16)
    if residual is not None:
        residual = residual.astype(jnp.bfloat16)
    if cinp != cin:
        x = jnp.pad(x, [(0, 0)] * 4 + [(0, cinp - cin)])
        gn_w = jnp.pad(gn_w, [(0, 0), (0, cinp - cin)])
        gn_b = jnp.pad(gn_b, [(0, 0), (0, cinp - cin)])
        kernel = jnp.pad(kernel, [(0, 0)] * 3 + [(0, cinp - cin), (0, 0)])
    if coutp != cout:
        kernel = jnp.pad(kernel, [(0, 0)] * 4 + [(0, coutp - cout)])
        bias = jnp.pad(bias, [(0, coutp - cout)])
    # spatial H/W zero-pad (one row/col each side) so the 27 taps become
    # contiguous flat row slices inside the kernel; the pad is a cheap XLA
    # copy that typically fuses with x's producer
    x = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    tk, tn = _pick_tiles(D * H * W, D * Hp * Wp, cinp, coutp)
    n_k, n_j = cinp // tk, coutp // tn
    w27 = kernel.astype(jnp.bfloat16).reshape(27, cinp, coutp)

    has_res = residual is not None
    if has_res and coutp != cout:
        residual = jnp.pad(residual, [(0, 0)] * 4 + [(0, coutp - cout)])
    res = residual if has_res else jnp.zeros((B, 1, 1, 1, tn), out_dtype)

    body = functools.partial(
        _conv_kernel, D=D, H=H, W=W, TK=tk, TN=tn, n_k=n_k,
        activate=activate, has_residual=has_res, out_dtype=out_dtype)

    y = pl.pallas_call(
        body,
        grid=(B, n_j, n_k),
        in_specs=[
            pl.BlockSpec((1, D, Hp, Wp, tk), lambda b, j, k: (b, 0, 0, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, tk, tn), lambda b, j, k: (0, k, j),
                         memory_space=pltpu.VMEM),
            # per-(B, C) vectors are replicated over an 8-sublane axis so
            # their blocks satisfy the (8, 128) TPU tiling constraint
            pl.BlockSpec((1, 8, tk), lambda b, j, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tk), lambda b, j, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tn), lambda b, j, k: (0, 0, j),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, D, H, W, tn), lambda b, j, k: (b, 0, 0, 0, j),
                          memory_space=pltpu.VMEM) if has_res else
             pl.BlockSpec((1, 1, 1, 1, tn), lambda b, j, k: (0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((1, D, H, W, tn),
                               lambda b, j, k: (b, 0, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W, coutp), out_dtype),
        scratch_shapes=[pltpu.VMEM((D * Hp * Wp, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w27,
      jnp.broadcast_to(gn_w.astype(jnp.float32)[:, None, :], (B, 8, cinp)),
      jnp.broadcast_to(gn_b.astype(jnp.float32)[:, None, :], (B, 8, cinp)),
      jnp.broadcast_to(bias.astype(jnp.float32)[None, None, :],
                       (1, 8, coutp)), res)
    return y[..., :cout] if coutp != cout else y


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
