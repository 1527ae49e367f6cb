"""A/B: train-step throughput with precomputed VQ latents vs per-step encode.

The reference re-encodes up to 64 x 64^3 SDF grids through the FROZEN VQ
encoder on every training step (/root/reference/model/echo2shape.py:348-349,
under no_grad); `scripts/precompute_latents.py` + `train.cli --latent_cache`
instead ship the 3 x 16^3 latents from an npz computed once.  This script
measures what that is worth on the chip at flagship dims, in the validated
bf16 mixed-precision training configuration (BASELINE.md round-4):

  * `benchmarks.time_train_step` (one dispatched lax.scan of 8 optimizer
    steps, D2H readback) on the SDF batch and on the latent batch built by
    `benchmarks.to_latent_batch` (same module method the loss runs, so the
    loss is identical to float rounding — tests/test_end_to_end.py);
  * per-step FLOPs for both programs (trip-count-correct, see
    benchmarks._compiled_flops) so the removed encode work is visible.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--compute_dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from echoscene_tpu.benchmarks import (build_flagship, chip_peak_flops,
                                          time_train_step, to_latent_batch)

    out = {}
    peak = chip_peak_flops()
    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8, batch_scenes=8,
                                      compute_dtype=args.compute_dtype)
    lat_batch = to_latent_batch(sg, state, batch)
    for name, b in (("sdf", batch), ("latent", lat_batch)):
        # fresh state per arm: time_train_step donates/consumes the buffers
        sps, flops = time_train_step(sg, state if name == "sdf" else
                                     sg.init(jax.random.PRNGKey(0), b),
                                     b, 8, return_flops=True)
        out[f"train_sps_{name}"] = round(sps, 2)
        out[f"flops_per_step_{name}"] = round(flops) if flops else None
        if peak and flops:
            out[f"mfu_{name}"] = round(flops * sps / 8 / peak, 4)
        print(f"[{name}] {sps:.2f} scenes/sec/chip"
              + (f"  ({flops / 1e12:.2f} TFLOP/step)" if flops else ""),
              flush=True)
    if out.get("train_sps_sdf"):
        out["speedup"] = round(out["train_sps_latent"]
                               / out["train_sps_sdf"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
