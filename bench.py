"""Benchmark: full dual-branch scene generation throughput on one chip.

Measures the north-star metric (BASELINE.json): scenes/sec for COMPLETE scene
generation — 1000-step layout DDPM chain + 100-step shape DDIM chain (echo
GCN inside every denoising step of both) + VQ-VAE decode to 64^3 SDF grids —
at flagship model dimensions.  The single JSON line additionally records
  * fast_profile: the opt-in serving configuration (int8 W8A8 shape-UNet
    convs + DPM-Solver++(2M) 50-step layout / 20-step shape), and
  * train_scenes_per_sec: the flagship train step (8 scenes, bf16 mixed
    precision — f32 master params/AdamW state, bf16 module compute; the
    r4 A/B measured +15.5% over f32 with 600-step convergence within the
    f32 tail's 3-sigma noise, BASELINE.md round-4), timed as one
    dispatched lax.scan of 8 steps,
so the driver-captured BENCH_r{N}.json catches regressions in all three.

The reference never measured throughput (its timing code is commented out,
train_3dfront.py:283-285).  `vs_baseline` is measured against a reference-cost
model derived from its sampling structure: 1100 host-driven denoiser
dispatches per scene batch at a conservative 10 ms/step GPU dispatch+compute
plus VQ decode -> ~0.09 scenes/sec.  See BASELINE.md.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json

# Reference-cost model (BASELINE.md): the reference's eval loop samples ONE
# scene per run (batch_size=1 hardcoded, eval_3dfront.py:236-241) — 1000
# host-driven layout steps + 100 DDIM steps + VQ decode at ~10 ms/dispatch
# ≈ 11 s/scene ≈ 0.09 scenes/sec on its GPU.
REFERENCE_SCENES_PER_SEC = 0.09


def main():
    import os

    import jax
    try:
        # persistent compile cache: the three flagship programs cost
        # ~15-20 min of tunnel compiles cold; warm re-runs skip all of it
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from echoscene_tpu.benchmarks import (build_flagship, chip_peak_flops,
                                          time_generation, time_train_step)

    batch_scenes = 8
    # tight node capacity: padded rows cost full denoiser FLOPs in the chains
    # compute_dtype follows the CONFIG DEFAULT (bfloat16 since r5 — the r4
    # A/B-validated configuration: 44.58 vs 38.60 scenes/sec/chip,
    # convergence within f32 noise), so the bench regression-guards exactly
    # what `train.cli` runs out of the box.  The sampling path is unaffected:
    # it runs on the inference twin, built with sample_dtype (bf16) structure
    # either way.
    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8,
                                      batch_scenes=batch_scenes)
    scenes_per_sec, sample_flops = time_generation(
        sg, state, batch, batch_scenes, return_flops=True)
    # train step second: time_train_step donates/consumes the state buffers
    train_sps, train_flops = time_train_step(sg, state, batch, batch_scenes,
                                             return_flops=True)
    del sg, state, batch

    sg_f, state_f, batch_f = build_flagship(max_nodes=48, max_triples=112,
                                            diffusion_bs=8,
                                            batch_scenes=batch_scenes,
                                            fast_profile=True)
    fast_sps = time_generation(sg_f, state_f, batch_f, batch_scenes)

    # MFU vs the chip's dense bf16 MXU peak (machine-checked form of the
    # BASELINE.md conv-ceiling claim: trip-count-correct analytic FLOPs /
    # measured wall time / spec-sheet peak — XLA's cost analysis counts a
    # lax.scan body once, so the chains' per-body counts are recovered from
    # uncompiled lowerings and multiplied by the chain lengths,
    # benchmarks.sample_chain_flops); null when the backend exposes no cost
    # analysis or the chip is unknown.
    peak = chip_peak_flops()
    mfu_sample = (sample_flops * scenes_per_sec / batch_scenes / peak
                  if peak and sample_flops else None)
    mfu_train = (train_flops * train_sps / batch_scenes / peak
                 if peak and train_flops else None)

    print(json.dumps({
        "metric": "scenes/sec (full generation: 1000-step layout DDPM + "
                  "100-step shape DDIM + VQ decode, 8-scene batch)",
        "value": round(scenes_per_sec, 4),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / REFERENCE_SCENES_PER_SEC, 2),
        "fast_profile": round(fast_sps, 4),
        "fast_profile_desc": "opt-in serving config: int8 convs + DPM++(2M) "
                             "50-step layout / 20-step shape",
        "train_scenes_per_sec": round(train_sps, 2),
        "mfu_sample": round(mfu_sample, 4) if mfu_sample else None,
        "mfu_train": round(mfu_train, 4) if mfu_train else None,
        "flops_per_scene_sample": (round(sample_flops / batch_scenes)
                                   if sample_flops else None),
        "flops_per_scene_train": (round(train_flops / batch_scenes)
                                  if train_flops else None),
    }))


if __name__ == "__main__":
    main()
