"""VQ-VAE training CLI.

The reference never ships a working VQ-VAE trainer (its vqvae_model.py is
broken legacy; the codebook is downloaded, README.md:81).  This CLI trains one
from SDF grids so the full pipeline is reproducible end-to-end:
  python scripts/train_vqvae.py --dataset <root> --exp <dir> --steps 20000
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--exp", default="./vqvae_exp")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vq_cfg", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "vqvae_snet.yaml"))
    args = p.parse_args(argv)

    import jax
    import yaml
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.models.config import VQVAEConfig
    from echoscene_tpu.train.vqvae_trainer import VQVAETrainer
    from echoscene_tpu.train.checkpoint import save_checkpoint

    with open(args.vq_cfg) as f:
        vq_yaml = yaml.safe_load(f)["model"]["params"]
    cfg = VQVAEConfig(embed_dim=vq_yaml["embed_dim"], n_embed=vq_yaml["n_embed"])
    dd = vq_yaml.get("ddconfig", {})
    for k, v in dd.items():
        if hasattr(cfg, k):
            setattr(cfg, k, tuple(v) if isinstance(v, list) else v)

    ds = SGFrontDataset(args.dataset, room_type=args.room_type, use_sdf=True,
                        with_changes=False, shuffle_objs=False,
                        seed=args.seed)
    # unique object SDF paths (each 3D-FUTURE object once)
    paths = sorted({p for i in range(len(ds))
                    for p in ((ds[i].sdf_paths or []) if ds[i] else [])
                    if p})
    print(f"[vqvae] {len(paths)} unique SDFs")
    rng = np.random.default_rng(args.seed)

    def batches():
        while True:
            idx = rng.choice(len(paths), size=args.batch)
            yield np.stack([ds.load_sdf(paths[i]) for i in idx])

    trainer = VQVAETrainer(cfg, lr=args.lr)
    it = batches()
    state = trainer.init(jax.random.PRNGKey(args.seed), next(it))
    os.makedirs(args.exp, exist_ok=True)
    t0 = time.time()
    for step in range(args.steps):
        state, logs = trainer.train_step(state, next(it))
        if (step + 1) % 100 == 0:
            print(f"step {step + 1}: total {float(logs['loss_total']):.5f} "
                  f"rec {float(logs['loss_rec']):.5f} "
                  f"codebook {float(logs['loss_codebook']):.5f} "
                  f"({(step + 1) / (time.time() - t0):.2f} it/s)")
        if (step + 1) % args.eval_every == 0:
            eval_bs = [np.stack([ds.load_sdf(paths[i]) for i in
                                 range(k, min(k + args.batch, min(64, len(paths))))])
                       for k in range(0, min(64, len(paths)), args.batch)]
            iou, iou_std = trainer.eval_iou(state, eval_bs)
            print(f"[vqvae eval] IoU {iou:.4f} ± {iou_std:.4f}")
            if iou > trainer.best_iou:
                trainer.best_iou = iou
                save_checkpoint(os.path.join(args.exp, "epoch-best"), state)
                print("[vqvae] saved epoch-best")
    save_checkpoint(os.path.join(args.exp, "final"), state)
    print("[vqvae] done")


if __name__ == "__main__":
    main()
