"""A/B: gradient checkpointing (remat) ON vs OFF for the train step.

The reference trains with activation checkpointing unconditionally
(config/full_mp.yaml `checkpoint: True`; CheckpointFunction,
model/networks/diffusion_shape/ldm_diffusion_util.py:125-172) because its
GPU memory needed it.  On a 16 GB TPU chip at flagship dims (8 scenes,
diffusion_bs 8, bf16 mixed precision) the activations may simply FIT, in
which case remat's recompute (~ one extra forward through every ResBlock and
transformer block in the backward pass) is pure overhead.

Methodology: `benchmarks.time_train_step` (one dispatched lax.scan of k
optimizer steps with donated carry + D2H readback — the BASELINE.md
tunnel-timing rule) per arm.  OOM in the remat-off arm is a result, not a
failure: it is caught and reported.

Numerics are unaffected by remat (same math, different schedule), so no
convergence A/B is needed — loss equality at one step is asserted instead
(bf16 rounding tolerance).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--check_loss_parity", action="store_true",
                   help="also run one un-donated loss eval per arm and "
                        "compare (costs one extra compile)")
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
                                          time_train_step)

    out = {}
    losses = {}
    for remat in (True, False):
        tag = "remat_on" if remat else "remat_off"
        try:
            sg, state, batch = build_flagship(
                max_nodes=48, max_triples=112, diffusion_bs=8,
                batch_scenes=args.scenes, compute_dtype=args.dtype,
                use_checkpoint=remat)
            if args.check_loss_parity:
                loss, _ = sg.loss_fn(state.params, state.batch_stats, batch,
                                     jax.random.PRNGKey(7))
                losses[tag] = float(loss)
            sps, flops = time_train_step(sg, state, batch, args.scenes,
                                         return_flops=True)
            peak = chip_peak_flops()
            mfu = flops * sps / args.scenes / peak if (peak and flops) else None
            out[f"train_sps_{tag}"] = round(sps, 2)
            out[f"mfu_{tag}"] = round(mfu, 4) if mfu else None
            print(f"[{tag}] {sps:.2f} scenes/sec/chip"
                  + (f"  (MFU {mfu:.1%})" if mfu else ""), flush=True)
            del sg, state, batch
        except Exception as e:  # OOM is a result: report and continue
            out[f"train_sps_{tag}"] = None
            out[f"error_{tag}"] = f"{type(e).__name__}: {e}"[:300]
            print(f"[{tag}] FAILED: {type(e).__name__}: {e}", flush=True)
    if len(losses) == 2:
        out["loss_remat_on"] = round(losses["remat_on"], 6)
        out["loss_remat_off"] = round(losses["remat_off"], 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
