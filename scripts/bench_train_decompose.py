"""Decompose the train step's MFU gap (VERDICT r4 next #8).

The protocol SAMPLING chain runs at 49.0% of bf16 peak while the TRAIN step
sits at 34.8-37.6% (BENCH_r04) — this script attributes the gap by in-scan
timing three nested programs at flagship dims:

  fwd        loss forward only                       (the sampling-like slice)
  fwd+bwd    jax.value_and_grad, no optimizer        (adds the backward convs)
  full       fwd+bwd + AdamW + clip/sanitize         (adds the optimizer)

Each is ONE dispatched lax.scan of k steps (the only timing method that
survives the tunnel — BASELINE.md r2 notes), with its own cost-analysis FLOP
count, so each segment gets an MFU.  If fwd matches sampling MFU and fwd+bwd
drops, the gap is the backward convs (emitter property, close the axis); if
full drops well below fwd+bwd, the optimizer update (634.9M-param elementwise
sweep + param all-write) is the lever.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/echoscene_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from echoscene_tpu.benchmarks import (build_flagship, chip_peak_flops,
                                          _compiled_flops)

    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8,
                                      batch_scenes=args.scenes,
                                      compute_dtype=args.dtype)
    tx = sg.ensure_tx(state.params)
    peak = chip_peak_flops() or float("inf")
    k = args.k

    def scan_timed(label, body, carry, donate=False):
        # donate only the FINAL full-step stage (it must fit params+opt
        # twice otherwise); fwd/fwd+bwd reuse state.params afterwards, so
        # their carries must stay valid
        @functools.partial(jax.jit,
                           donate_argnums=(0,) if donate else ())
        def run(c, b, rngs):
            return jax.lax.scan(lambda cc, r: body(cc, b, r), c, rngs)

        rngs0 = jax.random.split(jax.random.PRNGKey(17), k)
        compiled = run.lower(carry, batch, rngs0).compile()
        flops = _compiled_flops(compiled)
        carry, out = compiled(carry, batch, rngs0)       # warm
        jax.block_until_ready(carry)
        float(jnp.asarray(out).sum())
        t0 = time.perf_counter()
        carry, out = compiled(carry, batch, jax.random.split(
            jax.random.PRNGKey(18), k))
        jax.block_until_ready(carry)
        acc = float(jnp.asarray(out).sum())
        dt = time.perf_counter() - t0
        assert acc == acc
        ms = dt / k * 1e3
        mfu = flops / (dt / k) / peak if flops else 0.0
        print(f"[{label}] {ms:.1f} ms/step, {flops/1e12:.2f} TFLOP/step, "
              f"MFU {mfu:.3f}", flush=True)
        return ms, flops, mfu

    out = {}

    # 1) forward only — params CARRIED, never closed over (closure params
    # become 2.4 GB of program literals and kill the remote compile)
    def fwd_body(c, b, rng):
        params = c
        loss, _ = sg.loss_fn(params, state.batch_stats, b, rng)
        return params, loss
    ms, fl, mfu = scan_timed("fwd", fwd_body, state.params)
    out.update(fwd_ms=round(ms, 1), fwd_mfu=round(mfu, 3))

    # 2) fwd + bwd, no update (params carried, grads reduced to a scalar)
    def fb_body(c, b, rng):
        params = c
        (loss, _), grads = jax.value_and_grad(
            sg.loss_fn, has_aux=True)(params, state.batch_stats, b, rng)
        gs = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                 for g in jax.tree_util.tree_leaves(grads))
        return params, loss + 0.0 * gs
    ms, fl, mfu = scan_timed("fwd+bwd", fb_body, state.params)
    out.update(fwd_bwd_ms=round(ms, 1), fwd_bwd_mfu=round(mfu, 3))

    # 3) full optimizer step (time_train_step's body, donated carry)
    def full_body(c, b, rng):
        params, bstats, opt = c
        (loss, (new_bs, _)), grads = jax.value_and_grad(
            sg.loss_fn, has_aux=True)(params, bstats, b, rng)
        updates, new_opt = tx.update(grads, opt, params)
        new_params = optax.apply_updates(params, updates)
        return (new_params, new_bs, new_opt), loss
    ms, fl, mfu = scan_timed(
        "full", full_body, (state.params, state.batch_stats, state.opt_state),
        donate=True)
    out.update(full_ms=round(ms, 1), full_mfu=round(mfu, 3),
               train_sps=round(args.scenes * 1e3 / ms, 2))

    out["bwd_minus_fwd_ms"] = round(out["fwd_bwd_ms"] - out["fwd_ms"], 1)
    out["opt_ms"] = round(out["full_ms"] - out["fwd_bwd_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
