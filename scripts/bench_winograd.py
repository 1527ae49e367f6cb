"""A/B: Winograd F(2,3)^3 vs XLA direct conv3d at shape-UNet shapes.

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

from echoscene_tpu.kernels.winograd import winograd_conv3d, transform_weights

STEPS = 50


def chain(fn, x, w, n=STEPS):
    def body(c, _):
        y = fn(c, w)
        # renormalize so the chain doesn't blow up; cheap vs the conv
        y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y)) + 1e-6)
        return y.astype(x.dtype), ()
    out, _ = jax.lax.scan(body, x, None, length=n)
    return out


def timeit(fn, x, w, label):
    f = jax.jit(lambda x, w: chain(fn, x, w))
    y = f(x, w)
    jax.block_until_ready(y)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = f(x, w)
    jax.block_until_ready(y)
    s = float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / (reps * STEPS)
    print(f"{label}: {dt*1e3:.3f} ms/conv   (checksum {s:.3e})")
    return dt


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def wino(x, w):
    return winograd_conv3d(x, w)


def main():
    rows = 41
    for (res, c) in [(16, 224), (8, 448), (4, 672)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (rows, res, res, res, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, c, c), jnp.bfloat16) * 0.05
        print(f"--- res={res}^3 C={c} rows={rows} ---")
        td = timeit(direct, x, w, "direct ")
        tw = timeit(wino, x, w, "winograd")
        flops = 2 * rows * res**3 * c * c * 27
        print(f"direct: {flops/td/1e12:.1f} TF/s effective; "
              f"speedup {td/tw:.2f}x")


if __name__ == "__main__":
    main()
