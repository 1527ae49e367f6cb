"""LDM-style attention stack, channel-last.

Behavioral reference: /root/reference/model/networks/diffusion_shape/
attention.py:39-396 — CrossAttention (scaled dot-product, heads folded into
batch), BasicTransformerBlock (self-attn -> cross-attn -> GEGLU FF, all
residual), SpatialTransformer{1D,3D} (GroupNorm eps=1e-6 -> 1x1 conv in ->
token attention -> zero-init 1x1 conv out -> residual).

The attention core is routed through `echoscene_tpu.kernels.attention` so a
Pallas flash kernel can replace the einsum path for the long (<=4096-token)
3D latent sequences without touching the modules.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..kernels.attention import dot_product_attention
from .quant import act_dtype, dense


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = dense(self.dim_out * 2, dtype=self.dtype)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype)(x)
        else:
            x = nn.gelu(dense(inner, dtype=self.dtype)(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return dense(self.dim, dtype=self.dtype)(x)


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None
    (attention.py:154-219)."""
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None, *, deterministic: bool = True):
        h, d = self.heads, self.dim_head
        inner = h * d
        # Single-key cross-attention is an exact identity: softmax over one
        # key is 1.0 regardless of q/k, so out == to_out(to_v(ctx)) broadcast
        # over the query tokens.  The echo conditioning is exactly this case
        # (context = one relation latent per object, openai_model_3d.py:843),
        # so the q/k projections and the per-token out projection are dead
        # compute at every denoising step.  Init still traces the full path
        # so the parameter tree is identical.
        if (context is not None and context.shape[1] == 1 and mask is None
                and not self.is_initializing()):
            v = dense(inner, use_bias=False, dtype=self.dtype,
                      name="to_v")(context)
            out = dense(self.query_dim, dtype=self.dtype, name="to_out")(v)
            out = jnp.broadcast_to(out, (x.shape[0], x.shape[1],
                                         self.query_dim))
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out,
                                               deterministic=deterministic)
            return out
        context = x if context is None else context
        q = dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, m, h, d)
        v = v.reshape(b, m, h, d)
        out = dot_product_attention(q, k, v, mask=mask)
        out = out.reshape(b, n, inner)
        out = dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF; all residual
    (attention.py:222-245)."""
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        x = CrossAttention(self.dim, None, self.n_heads, self.d_head,
                           self.dropout, self.dtype, name="attn1")(
                               nn.LayerNorm(name="norm1")(x),
                               deterministic=deterministic) + x
        x = CrossAttention(self.dim, self.context_dim, self.n_heads, self.d_head,
                           self.dropout, self.dtype, name="attn2")(
                               nn.LayerNorm(name="norm2")(x), context,
                               deterministic=deterministic) + x
        x = FeedForward(self.dim, glu=self.gated_ff, dropout=self.dropout,
                        dtype=self.dtype,
                        name="ff")(nn.LayerNorm(name="norm3")(x),
                                   deterministic=deterministic) + x
        return x


class SpatialTransformer(nn.Module):
    """Token-attention over flattened spatial dims, any spatial rank.

    Covers the reference's SpatialTransformer1D/3D (attention.py:298-396):
    GroupNorm(32, eps 1e-6) -> 1x1 conv to inner_dim -> flatten ->
    depth x BasicTransformerBlock -> unflatten -> zero-init 1x1 conv -> +x.
    Input is channel-last (B, *spatial, C).
    """
    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dropout: float = 0.0
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        from .blocks import group_norm_fast
        b, *spatial, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        groups = min(32, c)
        while c % groups:
            groups -= 1
        gn_scale = self.param("norm_scale", nn.initializers.ones, (c,),
                              jnp.float32)
        gn_bias = self.param("norm_bias", nn.initializers.zeros, (c,),
                             jnp.float32)
        h = group_norm_fast(x, groups, 1e-6, gn_scale, gn_bias)
        h = dense(inner, dtype=self.dtype, name="proj_in")(h)  # 1x1 conv == Dense
        h = h.reshape(b, -1, inner)
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            # rematerialised blocks are called without the deterministic kwarg
            # (dropout is 0 in every reference config; remat + static kwargs
            # interact poorly, so the combination is rejected explicitly).
            assert self.dropout == 0.0, "use_checkpoint requires dropout == 0"
            block_cls = nn.remat(BasicTransformerBlock, prevent_cse=False)
        for i in range(self.depth):
            blk = block_cls(inner, self.n_heads, self.d_head, self.context_dim,
                            self.dropout, dtype=self.dtype, name=f"block_{i}")
            if self.use_checkpoint:
                h = blk(h, context)
            else:
                h = blk(h, context, deterministic=deterministic)
        h = h.reshape(b, *spatial, inner)
        h = dense(c, kernel_init=nn.initializers.zeros,
                  bias_init=nn.initializers.zeros, dtype=self.dtype,
                  name="proj_out")(h)
        return h + x_in
