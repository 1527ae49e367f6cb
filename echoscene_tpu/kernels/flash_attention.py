"""Pallas fused attention for the shape UNet's voxel-token sequences.

The 3D denoiser self-attends over up to 1024 tokens (16x8x8 at ds=2) per
object with head dims 56/84 (openai_model_3d.py attention sites).  The XLA
einsum path materialises the (B, H, L, S) score tensor in HBM; this kernel
keeps the whole softmax(QK^T)V for one (batch*head, q-block) tile in VMEM —
at these sizes a full-K tile fits comfortably (K/V: L*128 lanes ~ 0.5 MB), so
a single-pass softmax is used rather than an online/streaming one.

Layout contract: q, k, v are (B, L, H, D) / (B, S, H, D); D is zero-padded to
a lane multiple (padding K/Q features adds zero to the logits and padded V
columns are sliced off, so the math is exact).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # (Bq, D)
    k = k_ref[0]                      # (S, D)
    v = v_ref[0]                      # (S, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (Bq, S)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_q_block(s: int, d_pad: int, requested) -> int:
    """Largest q block whose K/V + score tile fits the ~16 MB VMEM budget."""
    if requested is not None:
        return requested
    budget = 12 * 1024 * 1024   # leave headroom under the 16 MB scoped limit
    for qb in (512, 256, 128, 64, 32):
        need = 4 * (2 * s * d_pad + qb * d_pad * 2 + qb * s * 2)
        if need <= budget:
            return qb
    return 16


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    q_block=None) -> jnp.ndarray:
    """q: (B, L, H, D); k, v: (B, S, H, D) -> (B, L, H, D).

    custom_vjp: the forward is the Pallas kernel; the backward differentiates
    the mathematically identical einsum formulation (exact gradients, XLA
    path) — the sampler only needs the fast forward.
    """
    return _flash_attention_fwd_impl(q, k, v, q_block)


def _einsum_reference(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum("blhd,bshd->bhls", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _fa_fwd(q, k, v, q_block):
    return _flash_attention_fwd_impl(q, k, v, q_block), (q, k, v)


def _fa_bwd(q_block, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_einsum_reference, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


@functools.partial(jax.jit, static_argnames=("q_block",))
def _flash_attention_fwd_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              q_block=None) -> jnp.ndarray:
    b, l, h, d = q.shape
    s = k.shape[1]
    scale = d ** -0.5

    d_pad = _round_up(d, 128)
    q_block = _pick_q_block(s, d_pad, q_block)
    l_pad = _round_up(l, q_block)

    def prep(x, length, pad_len):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, length, d)   # (BH, L, D)
        return jnp.pad(x, ((0, 0), (0, pad_len - length), (0, d_pad - d)))

    qp = prep(q, l, l_pad)
    kp = prep(k, s, s)        # K/S stays unpadded along sequence
    vp = prep(v, s, s)

    grid = (b * h, l_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, l_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * l * s * d_pad,
            bytes_accessed=(b * h * (l + 2 * s) * d_pad * 4),
            transcendentals=b * h * l * s,
        ),
    )(qp, kp, vp)

    out = out[:, :l, :d].reshape(b, h, l, d)
    return jnp.swapaxes(out, 1, 2)
