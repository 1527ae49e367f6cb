"""Precompute frozen-VQ-VAE latents for every unique SDF in a dataset.

TPU-first optimization with no reference equivalent: the reference re-encodes
up to 64 x 64^3 SDF grids through the frozen VQ encoder on EVERY training step
(echo2shape.py:348-349).  Since the encoder is frozen and deterministic, the
3 x 16^3 latents can be computed once per unique 3D-FUTURE object (~thousands)
and memory-mapped at load time — removing ~99% of the shape-branch input
bandwidth and the whole encode cost from the training step.

Usage:
  python scripts/precompute_latents.py --dataset <root> --ckpt <vq_ckpt> \
      --out <root>/latent_cache.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--room_type", default="bedroom")
    p.add_argument("--out", default=None)
    p.add_argument("--ckpt", default=None, help="VQ-VAE checkpoint dir (orbax)")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.models.config import VQVAEConfig
    from echoscene_tpu.train.vqvae_trainer import VQVAETrainer

    ds = SGFrontDataset(args.dataset, room_type=args.room_type, use_sdf=True,
                        with_changes=False, shuffle_objs=False)
    # unique sdf paths over the whole split
    paths = set()
    for i in range(len(ds)):
        ex = ds[i]
        if ex is None or ex.sdf_paths is None:
            continue
        paths.update(p for p in ex.sdf_paths if p)
    paths = sorted(paths)
    print(f"[latents] {len(paths)} unique SDFs")

    trainer = VQVAETrainer(VQVAEConfig())
    sample = np.zeros((1, ds.sdf_res, ds.sdf_res, ds.sdf_res, 1), np.float32)
    state = trainer.init(jax.random.PRNGKey(0), sample)
    if args.ckpt:
        from echoscene_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(args.ckpt, state)

    out = {}
    buf, keys = [], []

    def flush():
        nonlocal buf, keys
        if not buf:
            return
        z = np.asarray(trainer.encode(state, np.stack(buf)))
        for k, zi in zip(keys, z):
            out[k] = zi.astype(np.float32)
        buf, keys = [], []

    # the zero grid (floor/_scene_ nodes) has a nonzero latent too
    buf.append(np.zeros((ds.sdf_res,) * 3 + (1,), np.float32))
    keys.append("__zero__")
    # threaded h5 reads overlap disk IO with the encode dispatches — the
    # serial pass was read-bound (~0.31 s/file cold, BASELINE r5)
    from echoscene_tpu.data.collate import _sdf_read_pool
    pool = _sdf_read_pool()
    CHUNK = 64          # bounded read-ahead: Executor.map submits everything
    for start in range(0, len(paths), CHUNK):
        part = paths[start:start + CHUNK]
        for pth, grid in zip(part, pool.map(ds.load_sdf, part)):
            buf.append(grid)
            keys.append(pth)
            if len(buf) == args.batch:
                flush()
    flush()

    dest = args.out or os.path.join(args.dataset, "latent_cache.npz")
    np.savez_compressed(dest, **{k: v for k, v in out.items()})
    print(f"[latents] wrote {len(out)} latents -> {dest}")


def make_latent_lookup(npz_path: str, latent_shape=(16, 16, 16, 3)):
    """Returns callable(path) -> latent, for collate_scenes(latent_lookup=...)."""
    data = np.load(npz_path)
    zero = data["__zero__"] if "__zero__" in data else np.zeros(
        latent_shape, np.float32)

    def lookup(path):
        if path is None or path not in data:
            return zero
        return data[path]

    return lookup


if __name__ == "__main__":
    main()
