"""Layout denoiser: per-object conditioned UNet over the 8-dim box vector,
with the embedded "echo" scene-graph message-passing pass.

Behavioral reference: /root/reference/model/networks/diffusion_layout/
denoise_net.py:451-806 (UNet1DModel).  Key structural facts preserved:
  * the box vector is a single length-1 token with `in_channels` channels —
    every conv is effectively a dense layer (the reference's 1D Upsample even
    interpolates with scale_factor=1, denoise_net.py:154),
  * every forward runs `box_messsage_passing` (:758-771): box_t is embedded
    (Dense 8->64), concatenated with the object embedding (and a projected
    time embedding when enable_t_emb), message-passed through a 5-layer
    triplet GCN with batch-norm MLPs, producing a 1280-d per-object relation
    latent,
  * crossattn mode REPLACES the incoming context with that latent (:791-792);
    concat mode appends it to the box token's channels (:789-790).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .blocks import timestep_embedding
from .gcn import GraphTripleConvNet
from .mlp import kaiming_normal
from .unet_core import UNetTorso


class LayoutDenoiser(nn.Module):
    in_channels: int = 8
    model_channels: int = 512
    out_channels: int = 8
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2)
    channel_mult: Sequence[int] = (1, 1, 1, 1)
    num_heads: int = 8
    transformer_depth: int = 1
    conditioning_key: str = "crossattn"   # 'crossattn' | 'concat'
    concat_dim: int = 1280
    crossattn_dim: int = 1280
    using_clip: bool = True
    enable_t_emb: bool = True
    use_checkpoint: bool = False
    dropout: float = 0.0
    # echo-GCN hyperparams (denoise_net.py:716-740)
    gconv_dim: int = 64
    gconv_num_layers: int = 5
    num_preds: int = 16
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        context_dim = self.crossattn_dim if self.conditioning_key == "crossattn" else None
        torso_in = self.in_channels + (self.concat_dim
                                       if self.conditioning_key == "concat" else 0)
        self.torso = UNetTorso(
            in_channels=torso_in,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_heads=self.num_heads,
            spatial_rank=1,
            transformer_depth=self.transformer_depth,
            context_dim=context_dim,
            dropout=self.dropout,
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
        )
        time_embed_dim = self.model_channels * 4
        self.time_mlp1 = nn.Dense(time_embed_dim, dtype=self.dtype)
        self.time_mlp2 = nn.Dense(time_embed_dim, dtype=self.dtype)
        # echo-GCN pieces
        self.pred_embeddings = nn.Embed(self.num_preds, self.gconv_dim * 2)
        self.box_embeddings = nn.Dense(self.gconv_dim, kernel_init=kaiming_normal)
        if self.enable_t_emb:
            self.box_time_emb = nn.Dense(self.gconv_dim)
        out_dim = self.concat_dim if self.conditioning_key == "concat" else self.crossattn_dim
        self.box_graph_conv = GraphTripleConvNet(
            input_dim_obj=0,  # inferred from inputs
            input_dim_pred=self.gconv_dim * 2,
            num_layers=self.gconv_num_layers,
            hidden_dim=self.gconv_dim * 4,
            pooling="avg",
            mlp_normalization="batch",
            residual=True,
            output_dim=out_dim,
            dtype=self.dtype,
        )

    def echo_message_passing(self, obj_embed, triples, box_t, emb,
                             obj_mask, triple_mask, train):
        """denoise_net.box_messsage_passing (:758-771)."""
        edges = triples[:, (0, 2)]
        box_embed = self.box_embeddings(box_t)
        pred_embed = self.pred_embeddings(triples[:, 1])
        parts = [obj_embed, box_embed]
        if self.enable_t_emb:
            parts.append(self.box_time_emb(emb))
        obj_box_embed = jnp.concatenate(parts, axis=1)
        box_rel_embed, _ = self.box_graph_conv(
            obj_box_embed, pred_embed, edges, obj_mask, triple_mask, train=train)
        return box_rel_embed

    def __call__(self, box_t: jnp.ndarray, obj_embed: jnp.ndarray,
                 triples: jnp.ndarray, t: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 obj_mask: Optional[jnp.ndarray] = None,
                 triple_mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        """box_t: (N, 8); obj_embed: (N, D_obj); triples: (T, 3); t: (N,).

        Returns eps prediction (N, out_channels).
        """
        t_emb = timestep_embedding(t, self.model_channels)
        emb = self.time_mlp2(nn.silu(self.time_mlp1(t_emb)))

        latent_box_rel = self.echo_message_passing(
            obj_embed, triples, box_t, emb, obj_mask, triple_mask, train)

        h = box_t
        if self.conditioning_key == "concat":
            h = jnp.concatenate([h, latent_box_rel], axis=-1)
            ctx = None
        elif self.conditioning_key == "crossattn":
            # the echo latent REPLACES any provided context (denoise_net.py:791-792)
            ctx = latent_box_rel[:, None, :]
        else:
            raise NotImplementedError(self.conditioning_key)

        h = h[:, None, :]  # (N, L=1, C) channel-last token
        out = self.torso(h, emb, ctx, deterministic=not train)
        return out[:, 0, :]
