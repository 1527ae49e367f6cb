"""Attention core: XLA einsum path + Pallas flash-attention for long sequences.

The module-level `dot_product_attention(q, k, v)` is the single entry point
used by every attention site in the framework (nn/attention.py).  Layout is
(B, L, H, D) for q and (B, S, H, D) for k/v — heads kept as a separate axis so
XLA can pick batched-matmul layouts.

Numerics match the reference CrossAttention (attention.py:154-219): scores
scaled by D^-0.5, softmax in f32.

The Pallas path (see flash_attention.py) activates automatically on TPU for
self-attention shapes where it wins (L == S >= PALLAS_MIN_SEQ and D a lane
multiple); everything else takes the einsum path, which XLA fuses well at
these sizes.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

PALLAS_MIN_SEQ = 512  # below this, plain einsum attention is faster on TPU
_DISABLE = os.environ.get("ECHOSCENE_DISABLE_PALLAS_ATTN") == "1"


def _einsum_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    d = q.shape[-1]
    scale = d ** -0.5
    scores = jnp.einsum("blhd,bshd->bhls", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(mask, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q: (B, L, H, D); k, v: (B, S, H, D); mask broadcastable to (B, H, L, S).

    Returns (B, L, H, D).
    """
    use_pallas = (
        not _DISABLE
        and mask is None
        and q.shape[1] == k.shape[1]
        and q.shape[1] >= PALLAS_MIN_SEQ
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from .flash_attention import flash_attention
        try:
            return flash_attention(q, k, v, 256)
        except Exception:  # pragma: no cover - fall back if lowering fails
            pass
    return _einsum_attention(q, k, v, mask)
