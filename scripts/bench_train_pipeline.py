"""End-to-end TRAIN throughput: the full Trainer loop on the chip.

Every recorded train figure (BASELINE.md: 44.58 scenes/sec/chip bf16) is an
in-scan measurement of the compiled step alone.  A real run additionally
pays the host pipeline — per-step h5 SDF reads (diffusion_bs x 1 MB grids),
collation, H2D transfer over the tunnel, and checkpoint saves — on ONE host
core.  This script runs `Trainer.train` itself at flagship dims on a
48-scene synthetic dataset and reports wall-clock scenes/sec for:

  * sdf arm:    per-step SDF loading + on-device frozen-VQ encode
                (the reference-parity configuration)
  * latent arm: `--latent_cache` precomputed latents (48 KB/object inputs —
                the configuration whose claimed IO win the in-memory in-scan
                bench could not see, BASELINE.md r4)

plus the measured pause of a checkpoint save with wait=True vs wait=False
(train/checkpoint.py async saves).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--scenes", type=int, default=48)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--unique_models", action="store_true",
                   help="one SDF h5 per object INSTANCE (real SG-FRONT "
                        "shape; ~1 MB x 3.5 files/scene on disk) instead of "
                        "the shared-model test fixture")
    p.add_argument("--drop_caches", action="store_true",
                   help="echo 3 > /proc/sys/vm/drop_caches before each "
                        "timed arm (cold-IO measurement; needs root)")
    p.add_argument("--skip_latent", action="store_true")
    p.add_argument("--skip_ckpt", action="store_true",
                   help="skip the checkpoint-pause probe (it costs ~6-10 "
                        "min: a sync save of the 2.4 GB state over the "
                        "tunnel)")
    args = p.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import numpy as np

    from echoscene_tpu.data.fake import make_fake_dataset
    from echoscene_tpu.data.sgfront import SGFrontDataset
    from echoscene_tpu.data.collate import CollateSpec
    from echoscene_tpu.models.config import load_config
    from echoscene_tpu.models.sgdiff import SGDiff
    from echoscene_tpu.train.trainer import Trainer, batch_iterator

    uniq = "_uniq" if args.unique_models else ""
    root = os.path.join("/tmp", f"echoscene_graft_fake_r64_s{args.scenes}{uniq}")
    if not os.path.isdir(root) or not os.listdir(root):
        t0 = time.perf_counter()
        make_fake_dataset(root, num_scenes=args.scenes, min_objs=3,
                          max_objs=5, sdf_res=64, with_sdf=True,
                          unique_models=args.unique_models)
        print(f"dataset generated in {time.perf_counter() - t0:.0f}s",
              flush=True)

    def drop_caches():
        if not args.drop_caches:
            return
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3\n")
            print("[page caches dropped]", flush=True)
        except OSError as e:
            print(f"[drop_caches failed: {e}]", flush=True)
    ds = SGFrontDataset(root, use_sdf=True, with_changes=True, seed=0,
                        sdf_res=64)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs", "full_mp.yaml"))
    cfg.max_nodes, cfg.max_triples = 48, 112
    cfg.diffusion_bs, cfg.batch_scenes = 8, 8
    cfg.compute_dtype = args.dtype
    spec = CollateSpec(max_nodes=48, max_triples=112, max_scenes=8,
                       diffusion_bs=8, with_sdf=True, sdf_res=64)
    sg = SGDiff(cfg, num_objs=len(ds.classes), num_preds=len(ds.pred_names),
                iou_stats=ds.box_stats)

    # latent arm lookup (built once; the build cost is the offline
    # precompute_latents.py pass, not a per-step cost)
    from precompute_latents import make_latent_lookup  # scripts/ on sys.path
    lat_npz = os.path.join(root, "latent_cache.npz")
    if not args.skip_latent and not os.path.exists(lat_npz):
        import precompute_latents
        t0 = time.perf_counter()
        precompute_latents.main(["--dataset", root, "--out", lat_npz])
        out_pre = round(time.perf_counter() - t0, 1)
        print(f"latent precompute pass: {out_pre}s", flush=True)

    out = {}
    arms = [("sdf", None)]
    if not args.skip_latent:
        arms.append(("latent", make_latent_lookup(lat_npz)))
    for arm, lookup in arms:
        first = next(batch_iterator(ds, spec, 8, np.random.default_rng(0),
                                    latent_lookup=lookup))
        state = sg.init(jax.random.PRNGKey(0), first)
        exp = f"/tmp/bench_pipe_{arm}"
        trainer = Trainer(sg, ds, spec, exp, batch_scenes=8,
                          log_every=10 ** 9, ckpt_every_epochs=10 ** 9,
                          latent_lookup=lookup)
        # warm: compile + first-touch caches (2 steps)
        state = trainer.train(state, epochs=10 ** 6, max_steps=2,
                              final_save=False)
        n0 = int(state.step)
        drop_caches()
        t0 = time.perf_counter()
        state = trainer.train(state, epochs=10 ** 6,
                              max_steps=args.steps, final_save=False)
        # tunnel timing trap: block_until_ready can return early — force a
        # REAL device-to-host readback of the final params inside the timing
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        acc = float(np.asarray(jax.device_get(leaf)).sum())
        dt = time.perf_counter() - t0
        assert acc == acc
        steps = int(state.step) - n0
        sps = steps * 8 / dt
        out[f"pipeline_sps_{arm}"] = round(sps, 2)
        print(f"[{arm}] {steps} steps in {dt:.1f}s = {sps:.2f} scenes/sec "
              f"(in-scan step-only reference: 44.6)", flush=True)

        if arm == "sdf" and not args.skip_ckpt:
            from echoscene_tpu.train.checkpoint import (save_checkpoint,
                                                        wait_for_checkpoints)
            t0 = time.perf_counter()
            save_checkpoint("/tmp/bench_pipe_ck_sync", state, wait=True)
            out["ckpt_save_sync_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            save_checkpoint("/tmp/bench_pipe_ck_async", state, wait=False)
            out["ckpt_save_async_pause_s"] = round(time.perf_counter() - t0, 2)
            wait_for_checkpoints()
            print(f"ckpt pause: sync {out['ckpt_save_sync_s']}s vs async "
                  f"{out['ckpt_save_async_pause_s']}s", flush=True)
        del state, trainer
    print(json.dumps(out))


if __name__ == "__main__":
    main()
