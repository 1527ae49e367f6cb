"""A/B: fused Pallas Winograd vs XLA direct conv3d at shape-UNet shapes.

In-scan lax.scan chains + D2H readback (BASELINE.md timing trap).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from echoscene_tpu.kernels.winograd_pallas import winograd_conv3d_pallas
from echoscene_tpu.kernels.winograd import transform_weights

STEPS = 30


def chain(fn, x, w, n=STEPS):
    def body(c, _):
        y = fn(c, w)
        y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y).astype(jnp.float32)) + 1e-6).astype(y.dtype)
        if y.shape != x.shape:   # K != C: fold back to C with a slice/tile
            y = jnp.broadcast_to(y[..., :1], x.shape)
        return y.astype(x.dtype), ()
    out, _ = jax.lax.scan(body, x, None, length=n)
    return out


def timeit(fn, x, w, label):
    f = jax.jit(lambda x, w: chain(fn, x, w))
    t0 = time.perf_counter()
    y = f(x, w)
    jax.block_until_ready(y)
    compile_s = time.perf_counter() - t0
    float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        y = f(x, w)
    jax.block_until_ready(y)
    s = float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (reps * STEPS)
    print(f"{label}: {dt*1e3:.3f} ms/conv (compile {compile_s:.0f}s, checksum {s:.3e})")
    return dt


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rows = 41
    for (d, h, wd, c, k) in [(16, 16, 16, 224, 224),
                             (16, 8, 8, 448, 448),
                             (16, 4, 4, 672, 672),
                             (16, 16, 16, 448, 224)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (rows, d, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, c, k), jnp.bfloat16) * 0.05
        print(f"--- ({d},{h},{wd}) C={c} K={k} rows={rows} ---")
        td = timeit(direct, x, w, "direct      ")
        tw = timeit(winograd_conv3d_pallas, x, w, "wino-pallas ")
        flops = 2 * rows * d * h * wd * c * k * 27
        print(f"direct {flops/td/1e12:.1f} TF/s; speedup {td/tw:.2f}x")


if __name__ == "__main__":
    main()
