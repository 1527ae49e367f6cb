"""A/B: f32 vs bf16 mixed-precision TRAINING (VERDICT r3 Next #1).

Sampling already runs bf16 at the measured conv-emitter ceiling; the train
step (38.95 scenes/sec/chip in r3) had only ever been timed at f32 despite
full `--compute_dtype bfloat16` plumbing (train/cli.py, models/config.py).
This script produces both halves of the decision:

  * THROUGHPUT: `benchmarks.time_train_step` (one dispatched lax.scan of 8
    optimizer steps, D2H readback — the BASELINE.md tunnel-timing rule) at
    flagship dims for each dtype, plus XLA's analytic FLOP count;
  * CONVERGENCE: N optimizer steps per dtype on the synthetic fixture with
    IDENTICAL rng streams (same noise/t draws), comparing tail-window loss
    means against the f32 tail's noise (3-sigma criterion) — the r1
    product-flow protocol applied as an A/B.

bf16 here is standard mixed precision: f32 master params + AdamW state,
module activations/matmuls in bf16 (flax `dtype`), GroupNorm/softmax f32
inside the modules, grad clip/NaN-sanitise in the optax chain unchanged.

Reference anchor: the semantics preserved are the reference's train hot
loop (scripts/train_3dfront.py:239-265).
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    """The timing and convergence phases build IDENTICAL train scans; the
    persistent cache makes the second lowering near-free (tunnel compiles
    are 5-15 min each)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def convergence_run(dtype: str, steps: int, batch_scenes: int = 8):
    """Run `steps` optimizer steps; returns the per-step loss array."""
    import jax
    import numpy as np
    import optax

    from echoscene_tpu.benchmarks import build_flagship

    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8,
                                      batch_scenes=batch_scenes,
                                      compute_dtype=dtype)
    tx = sg.ensure_tx(state.params)
    k = 8

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(carry, b, rngs):
        def body(c, rng):
            params, bstats, opt = c
            (loss, (new_bs, _)), grads = jax.value_and_grad(
                sg.loss_fn, has_aux=True)(params, bstats, b, rng)
            updates, new_opt = tx.update(grads, opt, params)
            new_params = optax.apply_updates(params, updates)
            return (new_params, new_bs, new_opt), loss
        return jax.lax.scan(body, carry, rngs)

    carry = (state.params, state.batch_stats, state.opt_state)
    losses = []
    t0 = time.perf_counter()
    for i in range(0, steps, k):
        rngs = jax.random.split(jax.random.PRNGKey(1000 + i), k)
        carry, ls = run(carry, batch, rngs)
        losses.append(np.asarray(ls, np.float64))
        if i % 80 == 0:
            print(f"  [{dtype}] step {i + k:4d}  loss {float(ls[-1]):.4f} "
                  f"(+{time.perf_counter() - t0:5.1f}s)", flush=True)
    return np.concatenate(losses)[:steps]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--skip_timing", action="store_true")
    p.add_argument("--skip_convergence", action="store_true")
    args = p.parse_args(argv)

    _enable_compile_cache()
    import numpy as np

    from echoscene_tpu.benchmarks import (build_flagship, chip_peak_flops,
                                          time_train_step)

    out = {}
    if not args.skip_timing:
        for dtype in ("float32", "bfloat16"):
            sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                              diffusion_bs=8, batch_scenes=8,
                                              compute_dtype=dtype)
            sps, flops = time_train_step(sg, state, batch, 8,
                                         return_flops=True)
            peak = chip_peak_flops()
            mfu = flops * sps / 8 / peak if (peak and flops) else None
            out[f"train_sps_{dtype}"] = round(sps, 2)
            out[f"mfu_{dtype}"] = round(mfu, 4) if mfu else None
            print(f"[{dtype}] {sps:.2f} scenes/sec/chip"
                  + (f"  (MFU {mfu:.1%} of bf16 peak)" if mfu else ""),
                  flush=True)
            del sg, state, batch

    if not args.skip_convergence:
        tail = max(50, args.steps // 6)
        curves = {}
        for dtype in ("float32", "bfloat16"):
            print(f"convergence run: {dtype}, {args.steps} steps", flush=True)
            curves[dtype] = convergence_run(dtype, args.steps)
        f32, b16 = curves["float32"], curves["bfloat16"]
        m32, m16 = f32[-tail:].mean(), b16[-tail:].mean()
        s32 = f32[-tail:].std()
        out.update(loss_f32_start=round(float(f32[:8].mean()), 4),
                   loss_f32_tail=round(float(m32), 4),
                   loss_bf16_tail=round(float(m16), 4),
                   f32_tail_std=round(float(s32), 4),
                   tail_window=tail,
                   within_noise=bool(abs(m16 - m32) <= 3 * s32))
        print(f"tail({tail}) f32 {m32:.4f} ± {s32:.4f}  bf16 {m16:.4f}  "
              f"|Δ| = {abs(m16 - m32):.4f} "
              f"({'WITHIN' if out['within_noise'] else 'OUTSIDE'} 3σ)",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
