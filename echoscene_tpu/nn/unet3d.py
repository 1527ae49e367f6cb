"""Shape denoiser: 3D UNet over (16, 16, 16, 3) VQ-VAE latents with the
embedded echo scene-graph message-passing pass.

Behavioral reference: /root/reference/model/networks/diffusion_shape/
openai_model_3d.py:452-863 (UNet3DModel) and network.py:11-43 (DiffusionUNet
conditioning dispatcher).  Preserved structure:
  * resampling touches only the inner two spatial dims (16^3 -> 16x8x8 ->
    16x4x4; openai_model_3d.py:188), attention at ds in {4, 2} runs over
    1024- and 256-token sequences,
  * echo pass (:800-814): the noisy latent is embedded by a conv/maxpool
    stack (conv3->32, pool/2, conv->64, pool k2 s4, flatten, dense->64),
    concatenated with the per-object conditioning embedding (+ projected time
    embedding), message-passed through a 5-layer batch-norm triplet GCN to a
    context_dim-sized relation latent,
  * crossattn: that latent replaces the context (:843-844); concat: it is
    reshaped to one extra (16,16,16) channel and appended (:841-842).

Layout is channel-last (M, D, H, W, C).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .blocks import timestep_embedding
from .gcn import GraphTripleConvNet
from .quant import act_dtype
from .unet_core import UNetTorso


class ShapeDenoiser(nn.Module):
    image_size: int = 16
    in_channels: int = 3
    model_channels: int = 224
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2)
    channel_mult: Sequence[int] = (1, 2, 3)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 1280
    conditioning_key: str = "crossattn"   # None | 'concat' | 'crossattn'
    message_passing: bool = True
    enable_t_emb: bool = True
    use_checkpoint: bool = False
    winograd: bool = False
    factored_upsample: bool = False
    dropout: float = 0.0
    gconv_dim: int = 64
    gconv_num_layers: int = 5
    num_preds: int = 16
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.conditioning_key == "concat":
            # conditioning + echo latent each add one (16,16,16) channel
            self.x_dim = self.image_size ** 3
            torso_in = self.in_channels + 2
            torso_ctx = None
        elif self.conditioning_key == "crossattn":
            self.x_dim = self.context_dim
            torso_in = self.in_channels
            torso_ctx = self.context_dim
        else:
            self.x_dim = self.context_dim
            torso_in = self.in_channels
            torso_ctx = None
        self.torso = UNetTorso(
            in_channels=torso_in,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_heads=self.num_heads,
            spatial_rank=3,
            transformer_depth=self.transformer_depth,
            context_dim=torso_ctx,
            dropout=self.dropout,
            use_checkpoint=self.use_checkpoint,
            winograd=self.winograd,
            factored_upsample=self.factored_upsample,
            dtype=self.dtype,
        )
        time_embed_dim = self.model_channels * 4
        adt = act_dtype(self.dtype)
        self.time_mlp1 = nn.Dense(time_embed_dim, dtype=adt)
        self.time_mlp2 = nn.Dense(time_embed_dim, dtype=adt)
        if self.message_passing:
            self.pred_embeddings = nn.Embed(self.num_preds, self.gconv_dim * 2)
            self.shape_conv1 = nn.Conv(32, (3, 3, 3), padding=1, dtype=adt)
            self.shape_conv2 = nn.Conv(64, (3, 3, 3), padding=1, dtype=adt)
            self.shape_dense = nn.Dense(self.gconv_dim)
            if self.enable_t_emb:
                self.shape_time_emb = nn.Dense(self.gconv_dim)
            self.shape_graph_conv = GraphTripleConvNet(
                input_dim_obj=0,
                input_dim_pred=self.gconv_dim * 2,
                num_layers=self.gconv_num_layers,
                hidden_dim=self.gconv_dim * 4,
                pooling="avg",
                mlp_normalization="batch",
                residual=True,
                output_dim=self.x_dim,
                dtype=act_dtype(self.dtype),
            )

    def _embed_shape_code(self, x):
        """Conv/pool stack embedding the noisy latent (openai_model_3d.py:757-764)."""
        h = self.shape_conv1(x)
        h = nn.max_pool(h, (2, 2, 2), strides=(2, 2, 2))          # 16^3 -> 8^3
        h = self.shape_conv2(h)
        h = nn.max_pool(h, (2, 2, 2), strides=(4, 4, 4))          # 8^3 -> 2^3
        return self.shape_dense(h.reshape(h.shape[0], -1))

    def echo_message_passing(self, obj_embed, triples, shape_code, emb,
                             obj_mask, triple_mask, train):
        edges = triples[:, (0, 2)]
        code = self._embed_shape_code(shape_code)
        pred_embed = self.pred_embeddings(triples[:, 1])
        if obj_embed.ndim == 3:
            obj_embed = obj_embed[:, 0, :]
        parts = [obj_embed, code]
        if self.enable_t_emb:
            parts.append(self.shape_time_emb(emb))
        obj_shape_embed = jnp.concatenate(parts, axis=1)
        shape_rel_embed, _ = self.shape_graph_conv(
            obj_shape_embed, pred_embed, edges, obj_mask, triple_mask, train=train)
        return shape_rel_embed

    def __call__(self, x: jnp.ndarray, obj_embed: jnp.ndarray,
                 triples: jnp.ndarray, t: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 obj_mask: Optional[jnp.ndarray] = None,
                 triple_mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        """x: (M, 16, 16, 16, C); obj_embed: (M, [1,] D); t: (M,).

        In 'concat' mode the conditioning channel must already be concatenated
        to x by the caller (mirroring network.py's c_concat dispatch).
        Returns (M, 16, 16, 16, out_channels).
        """
        t_emb = timestep_embedding(t, self.model_channels)
        emb = self.time_mlp2(nn.silu(self.time_mlp1(t_emb)))

        ctx = context
        if self.message_passing:
            latent = self.echo_message_passing(
                obj_embed, triples, x, emb, obj_mask, triple_mask, train)
            if self.conditioning_key == "concat":
                s = self.image_size
                x = jnp.concatenate(
                    [x, latent.reshape(-1, s, s, s, 1)], axis=-1)
                ctx = None
            elif self.conditioning_key == "crossattn":
                ctx = latent[:, None, :]   # replaces provided context (:843-844)

        return self.torso(x, emb, ctx, deterministic=not train)
