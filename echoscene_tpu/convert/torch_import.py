"""PyTorch reference checkpoint -> flax parameter converter.

Lets a reference user bring their trained EchoScene weights
(`<exp>/checkpoint/model<epoch>.pth`, layout saved by SGDiff.save —
model/SGDiff.py:123-129 / EchoScene.state_dict :534-543) into this framework.
Every converter is validated by numeric parity tests that run the ACTUAL
reference torch modules side by side (tests/test_torch_parity.py).

Conventions:
  * torch Linear weight (out, in) -> flax Dense kernel (in, out),
  * torch ConvNd weight (out, in, *k) -> flax Conv kernel (*k, in, out),
  * torch BatchNorm1d {weight, bias, running_mean, running_var} ->
    MaskedBatchNorm {scale, bias} + batch_stats {mean, var},
  * torch GroupNorm {weight, bias} -> {scale, bias} (group_norm_fast params),
  * torch Embedding weight -> flax Embed embedding (unchanged),
  * reference modules are channel-first; ours channel-last — handled entirely
    by kernel transposition (activations are layout-free at the param level).

All inputs are numpy arrays (call `{k: v.numpy() for k, v in sd.items()}` on
a torch state_dict first, or use `load_torch_state_dict`).

CLIP-conditioning requirement: imported reference checkpoints were trained on
OpenAI CLIP's PROJECTED text embeddings (clip.encode_text — layernorm(EOS
hidden) @ text_projection, dataset/threedfront_dataset.py:387,389).  A
converted model therefore needs `clip_backend` 'cache' (reference pickles) or
'transformers' (CLIPTextModelWithProjection.text_embeds — same vectors); the
hermetic 'hash' backend produces different conditioning and will not
reproduce the checkpoint's behavior.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

Params = Dict[str, object]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _np(sd, key):
    v = sd[key]
    return np.asarray(v, np.float32)


def linear(sd, prefix) -> Params:
    out = {"kernel": _np(sd, f"{prefix}.weight").T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def conv(sd, prefix) -> Params:
    w = _np(sd, f"{prefix}.weight")          # (out, in, *k)
    k = w.ndim - 2
    w = np.transpose(w, tuple(range(2, 2 + k)) + (1, 0))
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def embedding(sd, prefix) -> Params:
    return {"embedding": _np(sd, f"{prefix}.weight")}


def groupnorm(sd, prefix) -> Params:
    return {"scale": _np(sd, f"{prefix}.weight"),
            "bias": _np(sd, f"{prefix}.bias")}


def layernorm(sd, prefix) -> Params:
    return {"scale": _np(sd, f"{prefix}.weight"),
            "bias": _np(sd, f"{prefix}.bias")}


def batchnorm(sd, prefix):
    params = {"scale": _np(sd, f"{prefix}.weight"),
              "bias": _np(sd, f"{prefix}.bias")}
    stats = {"mean": _np(sd, f"{prefix}.running_mean"),
             "var": _np(sd, f"{prefix}.running_var")}
    return params, stats


# --- MLP (model/layers.py build_mlp) ---------------------------------------
def convert_mlp(sd, prefix, n_layers: int, batch_norm: bool,
                final_nonlinearity: bool = True):
    """Sequential indices: Linear[, BN][, ReLU] per layer
    (the final layer's BN/ReLU present iff final_nonlinearity)."""
    params: Params = {}
    stats: Params = {}
    idx = 0
    for i in range(n_layers):
        params[f"Dense_{i}"] = linear(sd, f"{prefix}.{idx}")
        idx += 1
        final = i == n_layers - 1
        if not final or final_nonlinearity:
            if batch_norm:
                p, s = batchnorm(sd, f"{prefix}.{idx}")
                params[f"MaskedBatchNorm_{i}"] = p
                stats[f"MaskedBatchNorm_{i}"] = s
                idx += 1
            idx += 1  # activation has no params
    return params, stats


# --- GraphTripleConv(Net) (model/graph.py) ----------------------------------
def convert_gconv(sd, prefix, batch_norm: bool, residual: bool):
    params: Params = {}
    stats: Params = {}
    p1, s1 = convert_mlp(sd, f"{prefix}.net1", 2, batch_norm)
    p2, s2 = convert_mlp(sd, f"{prefix}.net2", 2, batch_norm)
    params["net1"], params["net2"] = p1, p2
    if s1:
        stats["net1"] = s1
    if s2:
        stats["net2"] = s2
    if residual:
        params["proj_obj"] = linear(sd, f"{prefix}.linear_projection")
        params["proj_pred"] = linear(sd, f"{prefix}.linear_projection_pred")
    return params, stats


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def convert_gconv_net(sd, prefix, num_layers: int, batch_norm: bool,
                      residual: bool):
    params: Params = {}
    stats: Params = {}
    for i in range(num_layers):
        p, s = convert_gconv(sd, _join(prefix, f"gconvs.{i}"), batch_norm,
                             residual)
        params[f"gconv_{i}"] = p
        if s:
            stats[f"gconv_{i}"] = s
    return params, stats


# --- attention stack (diffusion_shape/attention.py) --------------------------
def convert_transformer_block(sd, prefix):
    p: Params = {
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "norm3": layernorm(sd, f"{prefix}.norm3"),
    }
    for attn in ("attn1", "attn2"):
        p[attn] = {
            "to_q": linear(sd, f"{prefix}.{attn}.to_q"),
            "to_k": linear(sd, f"{prefix}.{attn}.to_k"),
            "to_v": linear(sd, f"{prefix}.{attn}.to_v"),
            "to_out": linear(sd, f"{prefix}.{attn}.to_out.0"),
        }
    p["ff"] = {
        "GEGLU_0": {"Dense_0": linear(sd, f"{prefix}.ff.net.0.proj")},
        "Dense_0": linear(sd, f"{prefix}.ff.net.2"),
    }
    return p


def convert_spatial_transformer(sd, prefix, depth: int = 1):
    """SpatialTransformer{1D,3D}: GN -> 1x1 conv (as Dense) -> blocks -> 1x1."""
    gn = groupnorm(sd, f"{prefix}.norm")
    p: Params = {"norm_scale": gn["scale"], "norm_bias": gn["bias"]}
    w_in = conv(sd, f"{prefix}.proj_in")
    p["proj_in"] = {"kernel": w_in["kernel"].reshape(
        w_in["kernel"].shape[-2], w_in["kernel"].shape[-1]),
        "bias": w_in["bias"]}
    for i in range(depth):
        p[f"block_{i}"] = convert_transformer_block(
            sd, f"{prefix}.transformer_blocks.{i}")
    w_out = conv(sd, f"{prefix}.proj_out")
    p["proj_out"] = {"kernel": w_out["kernel"].reshape(
        w_out["kernel"].shape[-2], w_out["kernel"].shape[-1]),
        "bias": w_out["bias"]}
    return p


# --- UNet torso (denoise_net.py / openai_model_3d.py) ------------------------
def convert_resblock(sd, prefix, channels_change: bool):
    gn0 = groupnorm(sd, f"{prefix}.in_layers.0")
    gn1 = groupnorm(sd, f"{prefix}.out_layers.0")
    p: Params = {
        "GroupNorm32_0": gn0,
        "Conv_0": conv(sd, f"{prefix}.in_layers.2"),
        "Dense_0": linear(sd, f"{prefix}.emb_layers.1"),
        "GroupNorm32_1": gn1,
        "Conv_1": conv(sd, f"{prefix}.out_layers.3"),
    }
    if channels_change:
        p["Conv_2"] = conv(sd, f"{prefix}.skip_connection")
    return p


def convert_unet_torso(sd, prefix_in, prefix_mid, prefix_out, prefix_head,
                       model_channels: int, channel_mult: Sequence[int],
                       num_res_blocks: int, attention_resolutions,
                       in_channels: int, transformer_depth: int = 1):
    """Walk the reference UNet builder order (denoise_net.py:553-714 /
    openai_model_3d.py:566-742) mapping torch module indices to our names."""
    params: Params = {}
    mc = model_channels
    params["conv_in"] = conv(sd, f"{prefix_in}.0.0")

    t_idx = 1      # torch input_blocks index
    ch = mc
    ds = 1
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            params[f"in_{level}_{i}_res"] = convert_resblock(
                sd, f"{prefix_in}.{t_idx}.0", ch != mult * mc)
            ch = mult * mc
            if ds in attention_resolutions:
                params[f"in_{level}_{i}_attn"] = convert_spatial_transformer(
                    sd, f"{prefix_in}.{t_idx}.1", transformer_depth)
            t_idx += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}"] = {
                "Conv_0": conv(sd, f"{prefix_in}.{t_idx}.0.op")}
            t_idx += 1
            ds *= 2

    params["mid_res1"] = convert_resblock(sd, f"{prefix_mid}.0", False)
    params["mid_attn"] = convert_spatial_transformer(
        sd, f"{prefix_mid}.1", transformer_depth)
    params["mid_res2"] = convert_resblock(sd, f"{prefix_mid}.2", False)

    t_idx = 0
    skip_chans = [mc]
    ch2 = mc
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch2 = mult * mc
            skip_chans.append(ch2)
        if level != len(channel_mult) - 1:
            skip_chans.append(ch2)
    ch = ch2
    for level, mult in reversed(list(enumerate(channel_mult))):
        for i in range(num_res_blocks + 1):
            ich = skip_chans.pop()
            params[f"out_{level}_{i}_res"] = convert_resblock(
                sd, f"{prefix_out}.{t_idx}.0", (ch + ich) != mc * mult)
            ch = mc * mult
            li = 1
            if ds in attention_resolutions:
                params[f"out_{level}_{i}_attn"] = convert_spatial_transformer(
                    sd, f"{prefix_out}.{t_idx}.{li}", transformer_depth)
                li += 1
            if level and i == num_res_blocks:
                params[f"up_{level}"] = {
                    "Conv_0": conv(sd, f"{prefix_out}.{t_idx}.{li}.conv")}
                ds //= 2
            t_idx += 1

    params["out_norm"] = groupnorm(sd, f"{prefix_head}.0")
    params["conv_out"] = conv(sd, f"{prefix_head}.2")
    return params


# --- layout denoiser (denoise_net.py UNet1DModel) ----------------------------
def convert_layout_denoiser(sd, prefix: str, *, model_channels=512,
                            channel_mult=(1, 1, 1, 1), num_res_blocks=2,
                            attention_resolutions=(4, 2), in_channels=8,
                            gconv_num_layers=5, enable_t_emb=True):
    pfx = (prefix + ".") if prefix else ""
    strip = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
    params: Params = convert_unet_torso(
        strip, "input_blocks", "middle_block", "output_blocks", "out",
        model_channels, channel_mult, num_res_blocks, attention_resolutions,
        in_channels)
    params = {"torso": params}
    params["time_mlp1"] = linear(strip, "time_embed.0")
    params["time_mlp2"] = linear(strip, "time_embed.2")
    params["pred_embeddings"] = embedding(strip, "pred_embeddings")
    params["box_embeddings"] = linear(strip, "box_embeddings")
    if enable_t_emb:
        params["box_time_emb"] = linear(strip, "box_time_emb")
    gp, gs = convert_gconv_net(strip, "box_graph_cov", gconv_num_layers,
                               batch_norm=True, residual=True)
    params["box_graph_conv"] = gp
    stats = {"box_graph_conv": gs} if gs else {}
    return params, stats


# --- shape denoiser (openai_model_3d.py UNet3DModel) -------------------------
def convert_shape_denoiser(sd, prefix: str, *, model_channels=224,
                           channel_mult=(1, 2, 3), num_res_blocks=2,
                           attention_resolutions=(4, 2), in_channels=3,
                           gconv_num_layers=5, enable_t_emb=True,
                           message_passing=True):
    pfx = (prefix + ".") if prefix else ""
    strip = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
    params: Params = {"torso": convert_unet_torso(
        strip, "input_blocks", "middle_block", "output_blocks", "out",
        model_channels, channel_mult, num_res_blocks, attention_resolutions,
        in_channels)}
    params["time_mlp1"] = linear(strip, "time_embed.0")
    params["time_mlp2"] = linear(strip, "time_embed.2")
    stats: Params = {}
    if message_passing:
        params["pred_embeddings"] = embedding(strip, "pred_embeddings")
        params["shape_conv1"] = conv(strip, "shape_embeddings.0")
        params["shape_conv2"] = conv(strip, "shape_embeddings.2")
        params["shape_dense"] = linear(strip, "shape_embeddings.5")
        if enable_t_emb:
            params["shape_time_emb"] = linear(strip, "shape_time_emb")
        gp, gs = convert_gconv_net(strip, "shape_code_graph_cov",
                                   gconv_num_layers, batch_norm=True,
                                   residual=True)
        params["shape_graph_conv"] = gp
        if gs:
            stats["shape_graph_conv"] = gs
    return params, stats


# --- VQ-VAE (vqvae_networks) -------------------------------------------------
def _convert_vq_resblock(sd, prefix, channels_change: bool):
    p: Params = {
        "_VQGroupNorm_0": groupnorm(sd, f"{prefix}.norm1"),
        "Conv_0": conv(sd, f"{prefix}.conv1"),
        "_VQGroupNorm_1": groupnorm(sd, f"{prefix}.norm2"),
        "Conv_1": conv(sd, f"{prefix}.conv2"),
    }
    if channels_change:
        p["Conv_2"] = conv(sd, f"{prefix}.nin_shortcut")
    return p


def _convert_vq_attn(sd, prefix):
    return {
        "_VQGroupNorm_0": groupnorm(sd, f"{prefix}.norm"),
        "q": conv(sd, f"{prefix}.q"),
        "k": conv(sd, f"{prefix}.k"),
        "v": conv(sd, f"{prefix}.v"),
        "proj_out": conv(sd, f"{prefix}.proj_out"),
    }


def convert_vqvae(sd, prefix: str = "", *, ch=64, ch_mult=(1, 2, 4),
                  num_res_blocks=1, z_channels=3):
    pfx = (prefix + ".") if prefix else ""
    strip = {k[len(pfx):]: v for k, v in sd.items() if k.startswith(pfx)}
    enc: Params = {"conv_in": conv(strip, "encoder.conv_in")}
    block_in = ch
    for l, mult in enumerate(ch_mult):
        block_out = ch * mult
        for i in range(num_res_blocks):
            enc[f"down_{l}_block_{i}"] = _convert_vq_resblock(
                strip, f"encoder.down.{l}.block.{i}", block_in != block_out)
            block_in = block_out
        if l != len(ch_mult) - 1:
            enc[f"down_{l}_downsample"] = {
                "Conv_0": conv(strip, f"encoder.down.{l}.downsample.conv")}
    enc["mid_block_1"] = _convert_vq_resblock(strip, "encoder.mid.block_1", False)
    enc["mid_attn_1"] = _convert_vq_attn(strip, "encoder.mid.attn_1")
    enc["mid_block_2"] = _convert_vq_resblock(strip, "encoder.mid.block_2", False)
    enc["_VQGroupNorm_0"] = groupnorm(strip, "encoder.norm_out")
    enc["conv_out"] = conv(strip, "encoder.conv_out")

    dec: Params = {"conv_in": conv(strip, "decoder.conv_in")}
    dec["mid_block_1"] = _convert_vq_resblock(strip, "decoder.mid.block_1", False)
    dec["mid_attn_1"] = _convert_vq_attn(strip, "decoder.mid.attn_1")
    dec["mid_block_2"] = _convert_vq_resblock(strip, "decoder.mid.block_2", False)
    block_in = ch * ch_mult[-1]
    for l in reversed(range(len(ch_mult))):
        block_out = ch * ch_mult[l]
        for i in range(num_res_blocks):
            dec[f"up_{l}_block_{i}"] = _convert_vq_resblock(
                strip, f"decoder.up.{l}.block.{i}", block_in != block_out)
            block_in = block_out
        if l != 0:
            dec[f"up_{l}_upsample"] = {
                "Conv_0": conv(strip, f"decoder.up.{l}.upsample.conv")}
    dec["_VQGroupNorm_0"] = groupnorm(strip, "decoder.norm_out")
    dec["conv_out"] = conv(strip, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quantize": {"embedding": _np(strip, "quantize.embedding.weight")},
        "quant_conv": conv(strip, "quant_conv"),
        "post_quant_conv": conv(strip, "post_quant_conv"),
    }


# --- full checkpoint ---------------------------------------------------------
def convert_echoscene_checkpoint(sd: Dict[str, np.ndarray], cfg,
                                 gconv_num_layers: int = 5):
    """model<epoch>.pth -> (params, batch_stats) trees for EchoSceneModule.

    The reference dict mixes top-level layout/GCN keys with nested 'vqvae'
    and 'shape_df' sub-dicts (EchoScene.state_dict :534-543).
    """
    vq_sd = sd.pop("vqvae", None)
    df_sd = sd.pop("shape_df", None)
    for k in ("epoch", "counter", "opt"):
        sd.pop(k, None)

    params: Params = {}
    stats: Params = {}
    params["obj_embeddings_ec"] = embedding(sd, "obj_embeddings_ec")
    params["pred_embeddings_ec"] = embedding(sd, "pred_embeddings_ec")
    for name, tname, nl in (
            ("gconv_net_ec", "gconv_net_ec", gconv_num_layers),
            ("gconv_net_manipulation", "gconv_net_manipulation",
             min(gconv_num_layers, 5))):
        p, s = convert_gconv_net(sd, tname, nl,
                                 batch_norm=cfg.mlp_normalization == "batch",
                                 residual=cfg.residual)
        params[name] = p
        if s:
            stats[name] = s
    p, s = convert_mlp(sd, "rel_s_mlp", 2,
                       cfg.mlp_normalization == "batch",
                       final_nonlinearity=False)
    params["rel_s_mlp"] = p
    if s:
        stats["rel_s_mlp"] = s

    ld = cfg.layout_denoiser
    lp, ls = convert_layout_denoiser(
        sd, "LayoutDiff.df.model", model_channels=ld.model_channels,
        channel_mult=tuple(ld.channel_mult),
        num_res_blocks=ld.num_res_blocks,
        attention_resolutions=tuple(ld.attention_resolutions),
        in_channels=ld.in_channels, enable_t_emb=ld.enable_t_emb)
    params["layout_denoiser"] = lp
    if ls:
        stats["layout_denoiser"] = ls

    if df_sd is not None:
        df_sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
                 for k, v in df_sd.items()}
        sdn = cfg.shape_branch.denoiser
        sp, ss = convert_shape_denoiser(
            df_sd, "diffusion_net", model_channels=sdn.model_channels,
            channel_mult=tuple(sdn.channel_mult),
            num_res_blocks=sdn.num_res_blocks,
            attention_resolutions=tuple(sdn.attention_resolutions),
            in_channels=sdn.in_channels, enable_t_emb=sdn.enable_t_emb,
            message_passing=sdn.message_passing)
        params["shape_denoiser"] = sp
        if ss:
            stats["shape_denoiser"] = ss
    if vq_sd is not None:
        vq_sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
                 for k, v in vq_sd.items()}
        vqc = cfg.shape_branch.vqvae
        params["vqvae"] = convert_vqvae(
            vq_sd, ch=vqc.ch, ch_mult=tuple(vqc.ch_mult),
            num_res_blocks=vqc.num_res_blocks, z_channels=vqc.z_channels)
    return params, stats
