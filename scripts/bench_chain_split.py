"""Measure the protocol generation's non-shape-chain slices on the real chip.

VERDICT r2 next-#6 asks for measured answers on (a) overlapping the layout
chain with the shape chain and (b) the end-chain VQ decode cost under the
factored decoder.  This prints the three numbers that decide both:

  * full:        protocol generation (layout 1000-step DDPM + shape 100-step
                 DDIM + VQ decode), scenes/sec
  * layout_only: same call with gen_shape=False — the layout chain + encode
                 context + dispatch overhead
  * vq_decode:   the chunked decode_latent alone (same chunking as
                 sample_fn), timed in a varied-input loop with D2H readback

The maximum possible win from running the layout chain concurrently with the
shape chain is bounded by layout_only's share of full; the VQ decode share
bounds any further decoder work.  One TPU core executes one fusion at a
time, so "overlap" could only come from XLA interleaving independent ops —
the bound tells us whether the surgery could ever pay.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import json

    import jax
    import jax.numpy as jnp

    from echoscene_tpu.benchmarks import build_flagship, time_generation
    from echoscene_tpu.models.sgdiff import shape_row_capacity
    from echoscene_tpu.models.echo_scene import EchoSceneModule

    batch_scenes = 8
    sg, state, batch = build_flagship(max_nodes=48, max_triples=112,
                                      diffusion_bs=8,
                                      batch_scenes=batch_scenes)
    full_sps = time_generation(sg, state, batch, batch_scenes)
    layout_sps = time_generation(sg, state, batch, batch_scenes,
                                 gen_shape=False)

    # VQ decode alone, same chunked shape as sample_fn (decode_chunk=8)
    rows = shape_row_capacity(batch, multiple=1)
    r = sg.cfg.shape_branch.denoiser.image_size
    zc = sg.cfg.shape_branch.vqvae.embed_dim
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        state.params)
    variables = {"params": params, "batch_stats": state.batch_stats}
    chunk = 8
    mp = -(-rows // chunk) * chunk

    @jax.jit
    def decode(z0):
        zc_ = z0.reshape(mp // chunk, chunk, *z0.shape[1:])
        sdf = jax.lax.map(lambda z: sg.module_infer.apply(
            variables, z, method=EchoSceneModule.decode_latent), zc_)
        return sdf.reshape(mp, *sdf.shape[2:])

    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (mp, r, r, r, zc), jnp.bfloat16)
    out = decode(z)
    jax.block_until_ready(out)
    float(out.sum())  # D2H (timing trap: vary inputs + readback)
    n_iters = 5
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_iters):
        z = jax.random.normal(jax.random.PRNGKey(i + 1),
                              (mp, r, r, r, zc), jnp.bfloat16)
        out = decode(z)
    jax.block_until_ready(out)
    acc += float(out.sum())
    vq_sec = (time.perf_counter() - t0) / n_iters
    assert acc == acc

    full_sec = batch_scenes / full_sps
    layout_sec = batch_scenes / layout_sps
    print(json.dumps({
        "full_scenes_per_sec": round(full_sps, 4),
        "full_sec_per_batch": round(full_sec, 3),
        "layout_only_sec_per_batch": round(layout_sec, 3),
        "layout_share_pct": round(100 * layout_sec / full_sec, 2),
        "vq_decode_sec_per_batch": round(vq_sec, 3),
        "vq_decode_share_pct": round(100 * vq_sec / full_sec, 2),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
