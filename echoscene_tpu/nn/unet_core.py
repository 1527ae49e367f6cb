"""Generic OpenAI-UNet torso (input/middle/output blocks with skip concat).

Behavioral reference: the structurally identical UNet builders in
/root/reference/model/networks/diffusion_layout/denoise_net.py:451-714 and
.../diffusion_shape/openai_model_3d.py:452-742.  One implementation serves
both the 1D layout denoiser (spatial = a single length-1 token) and the 3D
shape denoiser (spatial = (16, H, W) latents, inner-two-dim resampling).

Channel-last throughout; attention sites are SpatialTransformers with
cross-attention to `context` ((B, S_ctx, context_dim)).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .blocks import GroupNorm32, ResBlock, Upsample, Downsample, _conv
from .quant import act_dtype
from .attention import SpatialTransformer


class UNetTorso(nn.Module):
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[int]
    num_heads: int
    spatial_rank: int
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    dropout: float = 0.0
    use_checkpoint: bool = False
    use_scale_shift_norm: bool = False
    winograd: bool = False    # sampling-only Winograd F(2,3)^3 3x3x3 convs
    factored_upsample: bool = False  # sampling-only factored upsample+conv
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        mc = self.model_channels

        def res(ch_in, ch_out, name):
            blk = ResBlock
            if self.use_checkpoint:
                blk = nn.remat(ResBlock, prevent_cse=False)
            return blk(channels=ch_in, out_channels=ch_out,
                       spatial_rank=self.spatial_rank, dropout=self.dropout,
                       use_scale_shift_norm=self.use_scale_shift_norm,
                       winograd=self.winograd,
                       dtype=self.dtype, name=name)

        def attn(ch, name):
            # attention runs bf16 even under the int8 sentinel: quantizing the
            # projections measured as a wash (0.4695 vs 0.4728 scenes/sec —
            # dynamic-quant overhead cancels the matmul savings at these token
            # counts) while adding quantization error, so convs-only wins
            return SpatialTransformer(
                in_channels=ch, n_heads=self.num_heads,
                d_head=ch // self.num_heads, depth=self.transformer_depth,
                context_dim=self.context_dim, dropout=self.dropout,
                use_checkpoint=self.use_checkpoint,
                dtype=act_dtype(self.dtype), name=name)

        hs = []
        # conv_in/conv_out keep the direct emitter: in/out channels are tiny
        # (3), so Winograd's 8x input-tile expansion outweighs its MAC saving
        h = _conv(mc, self.spatial_rank, dtype=self.dtype, name="conv_in")(x)
        hs.append(h)
        ch = mc
        ds = 1
        # --- input blocks -------------------------------------------------
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(ch, mult * mc, f"in_{level}_{i}_res")(h, emb)
                ch = mult * mc
                if ds in self.attention_resolutions:
                    h = attn(ch, f"in_{level}_{i}_attn")(h, context,
                                                         deterministic=deterministic)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, self.spatial_rank, dtype=self.dtype,
                               name=f"down_{level}")(h)
                ds *= 2
                hs.append(h)
        # --- middle -------------------------------------------------------
        h = res(ch, ch, "mid_res1")(h, emb)
        h = attn(ch, "mid_attn")(h, context, deterministic=deterministic)
        h = res(ch, ch, "mid_res2")(h, emb)
        # --- output blocks ------------------------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(h.shape[-1], mc * mult, f"out_{level}_{i}_res")(h, emb)
                ch = mc * mult
                if ds in self.attention_resolutions:
                    h = attn(ch, f"out_{level}_{i}_attn")(h, context,
                                                          deterministic=deterministic)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, self.spatial_rank, dtype=self.dtype,
                                 winograd=self.winograd,
                                 factored=self.factored_upsample,
                                 name=f"up_{level}")(h)
                    ds //= 2
        assert not hs
        # --- out head -----------------------------------------------------
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, self.spatial_rank, zero=True,
                  dtype=self.dtype, name="conv_out")(h)
        return h
