"""A/B: einsum vs Pallas flash attention at the shape-UNet ds4 site
(B=41, L=S=256, H=8, D=84) and the VQ-VAE mid site (8, 4096, 1, 256).

Timing rule (BASELINE.md trap): tunnel-side microbenchmarks must run as
in-scan lax.scan chains with a D2H readback; short standalone dispatches
read wrong in both directions.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from echoscene_tpu.kernels.attention import _einsum_attention
from echoscene_tpu.kernels.flash_attention import flash_attention

STEPS = 50


def chain(fn, q, k, v, n=STEPS):
    def body(c, _):
        y = fn(c, k, v)
        y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
        return y.astype(q.dtype), ()
    out, _ = jax.lax.scan(body, q, None, length=n)
    return out


def timeit(fn, q, k, v, label):
    f = jax.jit(lambda q, k, v: chain(fn, q, k, v))
    y = f(q, k, v)
    jax.block_until_ready(y)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = f(q, k, v)
    jax.block_until_ready(y)
    s = float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / (reps * STEPS)
    print(f"{label}: {dt*1e3:.3f} ms/site   (checksum {s:.3e})")
    return dt


def run_site(b, l, h, d, dtype):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, l, h, d), dtype)
    k = jax.random.normal(kk, (b, l, h, d), dtype)
    v = jax.random.normal(kv, (b, l, h, d), dtype)
    print(f"--- site ({b},{l},{h},{d}) {dtype} ---")
    t_e = timeit(lambda q, k, v: _einsum_attention(q, k, v, None),
                 q, k, v, "einsum")
    t_f = timeit(lambda q, k, v: flash_attention(q, k, v),
                 q, k, v, "flash ")
    print(f"speedup flash vs einsum: {t_e / t_f:.3f}x")


def main():
    dt = jnp.bfloat16
    run_site(41, 256, 8, 84, dt)    # UNet3D ds4 self-attn (6 sites/step)
    run_site(41, 1024, 8, 56, dt)   # UNet3D ds2 self-attn (sanity: flash wins)
    run_site(8, 4096, 1, 256, dt)   # VQ-VAE mid attention (streaming path)


if __name__ == "__main__":
    main()
