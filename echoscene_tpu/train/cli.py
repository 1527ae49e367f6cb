"""Training CLI — argparse-compatible with the reference's train_3dfront.py.

Reference flags (scripts/train_3dfront.py:21-66) are accepted with the same
names and defaults; TPU-specific capacity flags are added.  args.json is
written to the experiment dir so the eval CLI can rebuild the model
(train_3dfront.py:205-206 / eval_3dfront.py:334-337).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def bool_flag(s):
    if s in ("1", "True", True):
        return True
    if s in ("0", "False", False):
        return False
    raise ValueError(f"invalid bool flag {s!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--nepoch", type=int, default=200)
    p.add_argument("--outf", type=str, default="checkpoint")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--logf", default="logs")
    p.add_argument("--exp", default="./experiments/layout_test")
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--residual", type=bool_flag, default=False)
    p.add_argument("--pooling", type=str, default="avg")
    p.add_argument("--large", type=bool_flag, default=False)
    p.add_argument("--use_scene_rels", type=bool_flag, default=True)
    p.add_argument("--separated", type=bool_flag, default=True)
    p.add_argument("--with_SDF", type=bool_flag, default=False)
    p.add_argument("--with_CLIP", type=bool_flag, default=True)
    p.add_argument("--shuffle_objs", type=bool_flag, default=True)
    p.add_argument("--with_angles", type=bool_flag, default=True)
    p.add_argument("--bin_angle", type=bool_flag, default=False,
                   help="legacy 24-bin angle + mean/std box standardisation "
                        "(train_3dfront.py:51); the reference's own dataset "
                        "comment marks it incompatible with the diffusion "
                        "parameterisation (threedfront_dataset.py:300)")
    # 6 or 7 accepted for reference-CLI parity (train_3dfront.py:52,126-133).
    # Both feed the same 7-dim (size,trans,angle) vector into the layout
    # branch when with_angles=True — the reference's 7 merely carries the raw
    # angle inside dec_boxes instead of beside it, and p_losses converts the
    # last dim to sincos either way (diffusion_ddpm.py:488-489).
    p.add_argument("--num_box_params", type=int, default=6, choices=[6, 7])
    p.add_argument("--with_changes", type=bool_flag, default=True)
    p.add_argument("--loadmodel", type=bool_flag, default=False)
    p.add_argument("--loadepoch", type=int, default=90)
    p.add_argument("--replace_latent", type=bool_flag, default=True)
    p.add_argument("--network_type", default="echoscene",
                   choices=["echoscene", "echolayout"])
    p.add_argument("--diff_yaml", default="configs/full_mp.yaml")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--vis_num", type=int, default=2)
    # TPU-native additions
    p.add_argument("--max_nodes", type=int, default=0,
                   help="flat node capacity (0 = auto from batchSize)")
    p.add_argument("--max_triples", type=int, default=0)
    p.add_argument("--clip_backend", default="auto",
                   choices=["auto", "hash", "cache", "transformers"],
                   help="'auto' = installed real CLIP weights "
                        "(scripts/fetch_weights.py) if present, else hash "
                        "proxy; the RESOLVED backend is recorded in "
                        "args.json so eval matches training features")
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="training compute precision; defaults to the config "
                        "default (bfloat16 — the validated, benched "
                        "configuration; float32 is the escape hatch)")
    p.add_argument("--max_steps", type=int, default=0,
                   help="stop after N optimizer steps (0 = unlimited)")
    p.add_argument("--latent_cache", default=None,
                   help="npz from scripts/precompute_latents.py; ships VQ "
                        "latents instead of raw SDF grids")
    p.add_argument("--preview_every", type=int, default=10000)
    p.add_argument("--dp_devices", type=int, default=1,
                   help="data-parallel devices (shard_map over a 'data' mesh)")
    p.add_argument("--zero1", action="store_true",
                   help="shard the AdamW moments over the 'data' axis "
                        "(ZeRO-1: reduce-scatter grads, all-gather params; "
                        "same comm bytes as the replicated pmean step, "
                        "2*P/N instead of 2*P optimizer floats per device). "
                        "Requires --dp_devices > 1; incompatible with "
                        "--grad_accum > 1.")
    p.add_argument("--sdf_res", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vq_ckpt", default=None,
                   help="orbax dir from scripts/train_vqvae.py; overrides "
                        "the config's shape_branch.vq_ckpt")
    p.add_argument("--diffusion_bs", type=int, default=0,
                   help="override the shape-branch object capacity (the "
                        "yaml's hyper.batch_size; smaller fits one chip's "
                        "HBM — the reference default 64 assumes a larger "
                        "accelerator)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (mean of grads; "
                        "reach the reference's effective batch 64 on one "
                        "chip: --batchSize 16 --grad_accum 4)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..data.clip_text import ClipTextEncoder
    from ..data.collate import CollateSpec
    from ..data.sgfront import SGFrontDataset
    from ..models.config import load_config
    from ..models.sgdiff import SGDiff
    from .trainer import Trainer, dump_args

    clip = ClipTextEncoder(args.clip_backend)
    args.clip_backend = clip.backend  # record the RESOLVED backend
    if args.bin_angle:
        print("[train] WARNING: --bin_angle reproduces the legacy 24-bin "
              "angle encoding; the reference marks it 'not possible for "
              "current diffusion' (threedfront_dataset.py:300) — the sincos "
              "angle channels will carry bin indices.")
    dataset = SGFrontDataset(
        root=args.dataset, split="train_scans", room_type=args.room_type,
        shuffle_objs=args.shuffle_objs, use_sdf=args.with_SDF,
        use_scene_rels=args.use_scene_rels, with_changes=args.with_changes,
        large=args.large, clip=clip, seed=args.seed, sdf_res=args.sdf_res,
        bin_angle=args.bin_angle)

    cfg = load_config(args.diff_yaml, network_type=args.network_type,
                      with_clip=args.with_CLIP)
    cfg.residual = args.residual
    cfg.gconv_pooling = args.pooling
    cfg.separated = args.separated
    cfg.replace_latent = args.replace_latent
    cfg.use_angles = args.with_angles
    if args.diffusion_bs:
        cfg.diffusion_bs = args.diffusion_bs
    cfg.grad_accum = max(1, args.grad_accum)
    if args.compute_dtype:                 # None = keep the config default
        cfg.compute_dtype = args.compute_dtype
    cfg.layout_diffusion.train_stats_file = dataset.box_stats_path
    cfg.layout_denoiser.using_clip = args.with_CLIP
    max_nodes = args.max_nodes or int(args.batchSize * 16)
    max_triples = args.max_triples or max_nodes * 3
    cfg.max_nodes, cfg.max_triples = max_nodes, max_triples
    cfg.batch_scenes = args.batchSize

    num_objs = len(dataset.classes)
    num_preds = len(dataset.pred_names)
    sgdiff = SGDiff(cfg, num_objs=num_objs, num_preds=num_preds,
                    iou_stats=dataset.box_stats)

    # non-greedy object sampling requires message passing off (the echo GCN
    # needs the sub-batch's triples; EchoScene.py:103-104 asserts the same)
    if (cfg.shape_branch.sampling != "greedy"
            and cfg.network_type == "echoscene"):
        assert not cfg.shape_branch.denoiser.message_passing, (
            "shape_branch.sampling random/balance requires message_passing "
            "false (reference EchoScene.py:103-104)")
    spec = CollateSpec(
        max_nodes=max_nodes, max_triples=max_triples,
        max_scenes=args.batchSize, diffusion_bs=cfg.diffusion_bs,
        with_sdf=args.with_SDF and args.network_type == "echoscene",
        sdf_res=dataset.sdf_res,
        shape_sampling=cfg.shape_branch.sampling)

    # init with one real batch
    import jax
    from .trainer import batch_iterator
    first = next(batch_iterator(dataset, spec, args.batchSize,
                                np.random.default_rng(0)))
    state = sgdiff.init(jax.random.PRNGKey(args.seed), first)

    # load the separately-trained frozen VQ-VAE (reference model_utils.py:7-32
    # loads vq_ckpt at construction; here it grafts into the joint tree —
    # the optimizer never updates it, so it stays at the loaded weights)
    vq_ckpt = args.vq_ckpt or cfg.shape_branch.vq_ckpt
    if (vq_ckpt and args.network_type == "echoscene"
            and not args.loadmodel):
        if os.path.isdir(vq_ckpt):
            from .checkpoint import load_vqvae_params
            vq_params = load_vqvae_params(vq_ckpt, state.params["vqvae"])
            new_params = dict(state.params)
            new_params["vqvae"] = vq_params
            state = state.replace(params=new_params)
            print(f"[train] loaded frozen VQ-VAE from {vq_ckpt}")
        else:
            print(f"[train] WARNING: vq_ckpt {vq_ckpt!r} not found; "
                  "the frozen VQ-VAE keeps its random init")

    os.makedirs(args.exp, exist_ok=True)
    dump_args(args.exp, vars(args))

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(args.exp, args.logf))
    except Exception as e:  # pragma: no cover
        print(f"[train] tensorboard writer unavailable: {e}")

    latent_lookup = None
    if args.latent_cache:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "scripts"))
        from precompute_latents import make_latent_lookup
        latent_lookup = make_latent_lookup(args.latent_cache)

    trainer = Trainer(sgdiff, dataset, spec, args.exp,
                      batch_scenes=args.batchSize, seed=args.seed,
                      writer=writer, latent_lookup=latent_lookup,
                      dp_devices=args.dp_devices, zero1=args.zero1)
    if args.loadmodel:
        state = trainer.load(state, args.loadepoch)
    state = trainer.train(state, args.nepoch,
                          max_steps=args.max_steps or None,
                          preview_every=args.preview_every)
    return state


if __name__ == "__main__":
    main()
