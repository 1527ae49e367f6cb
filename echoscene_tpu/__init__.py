"""echoscene_tpu — a TPU-native scene-graph-conditioned 3D scene generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ymxlzgy/echoscene:
scene-graph-conditioned generation of 3D indoor scenes (layout boxes via a 1D
DDPM + per-object shapes via a latent 3D diffusion in a VQ-VAE SDF latent
space), with the "information echo" triplet-GCN message-passing pass inside
every denoising step.

Design principles (TPU-first, not a port):
  * fixed-shape, mask-padded graph batches (flat concat layout with global node
    indices, mirroring the reference's collate semantics but jit-stable),
  * all denoising loops are `lax.scan`s over precomputed coefficient tables —
    the whole 1000-step DDPM chain is ONE XLA computation,
  * data parallelism via `jax.sharding.Mesh` + `shard_map` over per-device
    graph shards; losses aggregated with `psum`,
  * float64 schedule tables precomputed host-side in NumPy, stored f32,
  * bf16 matmul-heavy paths with f32 accumulation (`preferred_element_type`).
"""

__version__ = "0.1.0"
