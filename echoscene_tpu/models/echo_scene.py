"""EchoScene orchestrator: graph encoder + manipulator GCNs feeding the dual
diffusion branches.

Behavioral reference: /root/reference/model/EchoScene.py:14-543 (Sg2ScDiffModel)
and model/EchoLayout.py (layout-only variant; here a config switch).  Preserved
semantics:
  * init_encoder (:143-157): [CLIP text feat ⊕ class embedding] for nodes,
    [CLIP rel feat ⊕ predicate embedding] for edges, 5-layer encoder GCN,
  * "append zero latents for missing nodes" (:334-342) -> multiply by the
    encoder-view node mask (shared node indexing, see core/graphbatch.py),
  * change_repr (:345-353): N(0,1) change code on touched nodes, zeros else,
    concatenated to the latent before the manipulator GCN,
  * replace_all_latent switch (:356-362): splice manipulated latents only at
    touched nodes, or take the manipulated output wholesale,
  * rel_s_mlp (:97-100, 364-370): MLP [640, 960, 1280] (no final activation)
    producing the shape branch's conditioned (c_s, from the latent) and
    unconditioned (uc_s, from the raw embedding) streams,
  * the layout branch conditions on the raw embedding (uc_b = obj_embed_) and
    the manipulated latent (c_b) (prepare_boxes :321-326, forward :377-381),
  * separated rel GCNs (:78-90) exist when `separated` but are NOT called in
    the live forward/sample paths (checked: layout_encoder/shape_encoder have
    no call sites) — instantiated here only when a future path needs them.

The module exposes pure sub-forwards (encode_context / layout_eps / shape_eps
/ vq encode/decode) so the training step and the `lax.scan` samplers can
compose them under one jit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.graphbatch import GraphBatch, SceneBatch
from .config import EchoSceneConfig
from ..nn.gcn import GraphTripleConvNet
from ..nn.mlp import MLP, kaiming_normal
from ..nn.unet1d import LayoutDenoiser
from ..nn.unet3d import ShapeDenoiser
from ..nn.vqvae import VQVAE


class EchoSceneModule(nn.Module):
    cfg: EchoSceneConfig
    num_objs: int
    num_preds: int

    def setup(self):
        cfg = self.cfg
        gdim = cfg.embedding_dim               # 64
        add_dim = 512 if cfg.with_clip else 0
        self.out_dim_ini_encoder = gdim * 2 + add_dim   # 640
        # 'int8' is a conv-quantization sentinel consumed by nn.blocks._conv;
        # everything that is not a torso conv computes in bf16 under it
        dtype = {"bfloat16": jnp.bfloat16, "int8": "int8"}.get(
            cfg.compute_dtype, None)
        from ..nn.quant import act_dtype
        adt = act_dtype(dtype)

        self.obj_embeddings_ec = nn.Embed(self.num_objs + 1, gdim * 2)
        self.pred_embeddings_ec = nn.Embed(self.num_preds, gdim * 2)

        gconv_common = dict(
            input_dim_pred=gdim * 2 + add_dim,
            hidden_dim=gdim * 4,
            pooling=cfg.gconv_pooling,
            mlp_normalization=cfg.mlp_normalization,
            residual=cfg.residual,
            dtype=adt,
        )
        self.gconv_net_ec = GraphTripleConvNet(
            input_dim_obj=gdim * 2 + add_dim,
            num_layers=cfg.gconv_num_layers,
            output_dim=self.out_dim_ini_encoder,
            **gconv_common)
        self.gconv_net_manipulation = GraphTripleConvNet(
            input_dim_obj=self.out_dim_ini_encoder + gdim + gdim * 2 + add_dim,
            num_layers=min(cfg.gconv_num_layers, 5),
            output_dim=self.out_dim_ini_encoder,
            **gconv_common)
        # EchoScene.py:78-90 — parameters exist under `separated` but the live
        # forward/sample paths never call them; omitted deliberately.

        if cfg.network_type == "echoscene":
            rel_dims = [self.out_dim_ini_encoder, 960, 1280]
            if cfg.shape_branch.denoiser.conditioning_key == "concat":
                rel_dims = [self.out_dim_ini_encoder, 1280, 4096]
            self.rel_s_mlp = MLP(rel_dims, batch_norm=cfg.mlp_normalization,
                                 final_nonlinearity=False, kernel_init="kaiming",
                                 dtype=adt)
            sd = cfg.shape_branch.denoiser
            self.shape_denoiser = ShapeDenoiser(
                image_size=sd.image_size, in_channels=sd.in_channels,
                model_channels=sd.model_channels, out_channels=sd.out_channels,
                num_res_blocks=sd.num_res_blocks,
                attention_resolutions=tuple(sd.attention_resolutions),
                channel_mult=tuple(sd.channel_mult), num_heads=sd.num_heads,
                transformer_depth=sd.transformer_depth,
                context_dim=sd.context_dim,
                conditioning_key=sd.conditioning_key,
                message_passing=sd.message_passing,
                gconv_num_layers=getattr(sd, "gconv_num_layers", 5),
                enable_t_emb=sd.enable_t_emb,
                use_checkpoint=sd.use_checkpoint,
                winograd=getattr(sd, "winograd", False),
                factored_upsample=getattr(sd, "factored_upsample", False),
                num_preds=16, dtype=dtype)
            vq = cfg.shape_branch.vqvae
            self.vqvae = VQVAE(
                n_embed=vq.n_embed, embed_dim=vq.embed_dim, ch=vq.ch,
                ch_mult=tuple(vq.ch_mult), num_res_blocks=vq.num_res_blocks,
                attn_resolutions=tuple(vq.attn_resolutions),
                in_channels=vq.in_channels, out_ch=vq.out_ch,
                z_channels=vq.z_channels, resolution=vq.resolution,
                factored_upsample=getattr(vq, "factored_upsample", False),
                dtype=adt)  # VQ decode stays bf16 even under int8 (runs once)

        ld = cfg.layout_denoiser
        self.layout_denoiser = LayoutDenoiser(
            in_channels=ld.in_channels, model_channels=ld.model_channels,
            out_channels=ld.out_channels, num_res_blocks=ld.num_res_blocks,
            attention_resolutions=tuple(ld.attention_resolutions),
            channel_mult=tuple(ld.channel_mult), num_heads=ld.num_heads,
            transformer_depth=ld.transformer_depth,
            conditioning_key=ld.conditioning_key, concat_dim=ld.concat_dim,
            crossattn_dim=ld.crossattn_dim, using_clip=ld.using_clip,
            gconv_num_layers=getattr(ld, "gconv_num_layers", 5),
            enable_t_emb=ld.enable_t_emb, use_checkpoint=ld.use_checkpoint,
            num_preds=16, dtype=adt)  # layout chain is <3% of sample time

    # ------------------------------------------------------------------
    def _embed_graph(self, view: GraphBatch):
        """[CLIP ⊕ class/pred embedding] streams (init_encoder :149-153)."""
        obj_embed = self.obj_embeddings_ec(view.objs)
        pred_embed = self.pred_embeddings_ec(view.preds())
        if self.cfg.with_clip:
            obj_embed = jnp.concatenate([view.text_feats, obj_embed], axis=1)
            pred_embed = jnp.concatenate([view.rel_feats, pred_embed], axis=1)
        return obj_embed, pred_embed

    def encode_context(self, batch: SceneBatch, change_noise: jnp.ndarray,
                       *, splice_untouched: Optional[bool] = None,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Graph encoder + manipulator; returns all conditioning streams.

        change_noise: (N, embedding_dim) standard normal draws; they are
        masked by batch.change_flags (so untouched nodes get zeros, matching
        EchoScene.py:345-353).
        """
        cfg = self.cfg
        enc, dec = batch.enc, batch.dec
        # encoder view
        enc_obj_embed, enc_pred_embed = self._embed_graph(enc)
        latent_obj, _latent_pred = self.gconv_net_ec(
            enc_obj_embed, enc_pred_embed, enc.edges(),
            enc.obj_mask, enc.triple_mask, train=train)
        # zero latents for nodes absent from the encoder view (:334-342)
        latent_obj = latent_obj * batch.enc_obj_mask[:, None]

        # change representation (:345-353)
        change = change_noise * batch.change_flags[:, None]
        latent_with_change = jnp.concatenate([latent_obj, change], axis=1)

        # manipulator on the decoder view (:354, manipulate :181-195)
        dec_obj_embed, dec_pred_embed = self._embed_graph(dec)
        man_in = jnp.concatenate([latent_with_change, dec_obj_embed], axis=1)
        latent_man, _ = self.gconv_net_manipulation(
            man_in, dec_pred_embed, dec.edges(),
            dec.obj_mask, dec.triple_mask, train=train)

        if splice_untouched is None:
            splice_untouched = not cfg.replace_latent
        if splice_untouched:
            touched = batch.change_flags[:, None]
            latent = latent_obj * (1 - touched) + latent_man * touched
        else:
            latent = latent_man

        out = {"latent": latent, "obj_embed": dec_obj_embed}
        if cfg.network_type == "echoscene":
            obj_mask = dec.obj_mask
            out["uc_s"] = self.rel_s_mlp(dec_obj_embed, obj_mask, train=train)
            out["c_s"] = self.rel_s_mlp(latent, obj_mask, train=train)
        return out

    # ------------------------------------------------------------------
    def layout_eps(self, box_t: jnp.ndarray, t: jnp.ndarray,
                   obj_embed: jnp.ndarray, batch: SceneBatch,
                   *, train: bool = False,
                   triples: Optional[jnp.ndarray] = None,
                   obj_mask: Optional[jnp.ndarray] = None,
                   triple_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """One denoiser evaluation for the layout branch.

        obj_embed is the UNconditioned stream (uc_b = raw embedding+CLIP);
        the conditioned stream is unused by the mp denoiser (its cross-attn
        context is replaced by the echo latent, denoise_net.py:791-792).

        triples/obj_mask/triple_mask default to the decoder view; the
        compacted sampling chain passes prefix-clipped overrides (the same
        remap select_shape_subbatch applies for training) so the 1000-step
        chain runs only over real node slots.
        """
        if triples is None:
            triples = batch.dec.triples
            obj_mask = batch.dec.obj_mask
            triple_mask = batch.dec.triple_mask
        return self.layout_denoiser(
            box_t, obj_embed, triples, t,
            obj_mask=obj_mask, triple_mask=triple_mask,
            train=train)

    def shape_eps(self, z_t: jnp.ndarray, t: jnp.ndarray,
                  obj_embed: jnp.ndarray, triples: jnp.ndarray,
                  obj_mask: jnp.ndarray, triple_mask: jnp.ndarray,
                  *, train: bool = False) -> jnp.ndarray:
        """One denoiser evaluation for the shape branch over M object slots."""
        return self.shape_denoiser(
            z_t, obj_embed, triples, t,
            obj_mask=obj_mask, triple_mask=triple_mask, train=train)

    # ------------------------------------------------------------------
    def encode_sdf(self, sdf: jnp.ndarray, chunk: int = 8) -> jnp.ndarray:
        """Frozen VQ-VAE pre-quant encode, chunked to bound peak activation
        memory (echo2shape.py:348-349 runs this under no_grad every step).

        sdf: (M, R, R, R, 1) -> (M, r, r, r, z); gradients stopped.
        """
        m = sdf.shape[0]
        if m % chunk == 0 and m > chunk:
            chunks = sdf.reshape(m // chunk, chunk, *sdf.shape[1:])
            z = jax.lax.map(
                lambda s: self.vqvae.encode_no_quant(s), chunks)
            z = z.reshape(m, *z.shape[2:])
        else:
            z = self.vqvae.encode_no_quant(sdf)
        return jax.lax.stop_gradient(z)

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        """Quantize + decode to a 64^3 SDF grid (decode_no_quant,
        network.py:95-103)."""
        return self.vqvae.decode_no_quant(z)

    def vq_forward(self, sdf: jnp.ndarray, *, deterministic: bool = True):
        """VQ-VAE training forward: reconstruction + codebook loss."""
        return self.vqvae(sdf, deterministic=deterministic)

    # ------------------------------------------------------------------
    def select_shape_subbatch(self, batch: SceneBatch):
        """Static-shape analogue of select_sdfs (EchoScene.py:246-319).

        greedy: nodes are scene-major with all padding at the global tail, so
        the greedy whole-scene packing is the prefix [0, num_valid) and the
        graph's triples remap onto the sub-batch (:290-308).
        random/balance: host-selected object rows arrive via shapes.indices;
        no triples reach the shape denoiser (mp_valid=False — the reference's
        non-greedy branch leaves triples_selected empty, :300, and asserts
        greedy when message passing is on, :103-104).
        """
        shapes = batch.shapes
        m = shapes.capacity
        nv = shapes.num_valid
        obj_mask = shapes.mask()
        s, o = batch.dec.triples[:, 0], batch.dec.triples[:, 2]
        mp = 1.0 if shapes.mp_valid else 0.0
        tri_mask = (batch.dec.triple_mask * mp *
                    (s < nv).astype(jnp.float32) * (o < nv).astype(jnp.float32))
        triples = jnp.stack([
            jnp.minimum(s, m - 1), batch.dec.triples[:, 1],
            jnp.minimum(o, m - 1)], axis=1)
        return obj_mask, triples, tri_mask

    def train_forward(self, batch: SceneBatch, change_noise: jnp.ndarray,
                      box_xt: jnp.ndarray, t_box: jnp.ndarray,
                      shape_noise: Optional[jnp.ndarray] = None,
                      t_shape: Optional[jnp.ndarray] = None,
                      sqrt_ac: Optional[jnp.ndarray] = None,
                      sqrt_1m_ac: Optional[jnp.ndarray] = None):
        """Joint forward for one training step (both branches, shared context).

        The caller precomputes the noised layout boxes (box_xt) and passes the
        shape-schedule coefficients gathered at t_shape so the VQ latent can be
        noised INSIDE this method (the latent requires the frozen VQ encoder).
        Mirrors Sg2ScDiffModel.forward (EchoScene.py:328-386).
        """
        ctx = self.encode_context(batch, change_noise, train=True)
        out: Dict[str, Any] = {}
        out["eps_box"] = self.layout_eps(box_xt, t_box, ctx["obj_embed"],
                                         batch, train=True)
        if self.cfg.network_type == "echoscene":
            shapes = batch.shapes
            if shapes.latent is not None:
                z0 = jax.lax.stop_gradient(shapes.latent)
            else:
                z0 = self.encode_sdf(shapes.sdf)
            bc = (slice(None),) + (None,) * (z0.ndim - 1)
            z_t = sqrt_ac[bc] * z0 + sqrt_1m_ac[bc] * shape_noise
            obj_mask, triples, tri_mask = self.select_shape_subbatch(batch)
            uc_s_sel = shapes.gather_rows(ctx["uc_s"])[:, None, :]
            out["eps_shape"] = self.shape_eps(
                z_t, t_shape, uc_s_sel, triples, obj_mask, tri_mask, train=True)
            out["shape_mask"] = obj_mask
        return out

    # ------------------------------------------------------------------
    def __call__(self, batch: SceneBatch, change_noise: jnp.ndarray,
                 z_t: Optional[jnp.ndarray] = None,
                 t_shape: Optional[jnp.ndarray] = None):
        """Init-only path touching every parameter once."""
        ctx = self.encode_context(batch, change_noise)
        n = batch.num_nodes
        box_t = jnp.zeros((n, self.cfg.layout_denoiser.in_channels))
        t = jnp.zeros((n,), jnp.int32)
        eps_box = self.layout_eps(box_t, t, ctx["obj_embed"], batch)
        outs: Dict[str, Any] = {"eps_box": eps_box}
        if self.cfg.network_type == "echoscene":
            if z_t is None:
                r = self.cfg.shape_branch.denoiser.image_size
                zc = self.cfg.shape_branch.vqvae.embed_dim
                z_t = jnp.zeros((2, r, r, r, zc))
                t_shape = jnp.zeros((2,), jnp.int32)
            m = z_t.shape[0]
            eps_shape = self.shape_eps(
                z_t, t_shape, ctx["uc_s"][:m, None, :],
                batch.dec.triples, batch.dec.obj_mask[:m],
                batch.dec.triple_mask)
            outs["eps_shape"] = eps_shape
            # tiny spatial size: conv params are resolution-independent
            r0 = 8
            dummy_sdf = jnp.zeros((1, r0, r0, r0, 1))
            dec, _ = self.vq_forward(dummy_sdf)
            outs["vq_dec"] = dec
        return outs
