"""Fixed-shape, mask-padded scene-graph batches.

The reference batches scenes by flat concatenation with global node indices
(dataset/threedfront_dataset.py:618-743: per-scene node/edge tensors are
concatenated, edge endpoints offset by a running node count, and
`obj_to_scene`/`triple_to_scene` maps identify scene membership).  That layout
is kept here — it is the natural layout for the echo GCN's segment ops — but
padded to static (N, T) capacities so every train/sample step jits once.

Encoder/decoder graph views share one node indexing (the decoder's).  The
reference's "append zero latents for missing nodes" (EchoScene.py:334-342)
becomes a multiply by `enc_obj_mask`; a removed edge is a zeroed
`enc_triple_mask` entry; a flipped relationship is a differing predicate in
`enc_triples` vs `triples`.

Conventions:
  * padded node slots have obj_mask == 0, category 0, obj_to_scene == num_scenes
    (a dedicated "ghost scene" so per-scene reductions ignore them),
  * padded triple slots have triple_mask == 0 and endpoints pointing at node 0
    (any valid slot; contributions are masked before pooling),
  * nodes are ordered scene-major, so the shape branch's greedy whole-scene
    packing (EchoScene.select_sdfs:290-308) reduces to a prefix length.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphBatch:
    """One graph view (encoder or decoder) over the flat node axis."""
    objs: jnp.ndarray            # i32[N] coarse category ids
    triples: jnp.ndarray         # i32[T, 3] (subject, predicate, object); s/o are flat node ids
    obj_mask: jnp.ndarray        # f32[N] 1 = real node
    triple_mask: jnp.ndarray     # f32[T] 1 = real edge
    text_feats: Optional[jnp.ndarray] = None   # f32[N, 512] CLIP per-node features
    rel_feats: Optional[jnp.ndarray] = None    # f32[T, 512] CLIP per-edge features

    @property
    def num_nodes(self) -> int:
        return self.objs.shape[0]

    @property
    def num_triples(self) -> int:
        return self.triples.shape[0]

    def edges(self) -> jnp.ndarray:
        """i32[T, 2] (s, o) endpoints — the GCN's gather/scatter indices."""
        return self.triples[:, (0, 2)]

    def preds(self) -> jnp.ndarray:
        return self.triples[:, 1]


@struct.dataclass
class ShapeSelection:
    """Shape-branch object sub-batch (EchoScene.select_sdfs :246-319).

    greedy (flagship; required when message passing is on, EchoScene.py:
    103-104): `sdf` holds the first `capacity` flat node slots' SDF grids
    (scene-major prefix); `num_valid` is the host-computed largest prefix of
    whole scenes with total object count <= capacity (:290-308); `indices`
    is None (identity prefix) and triples stay valid.

    random / balance (:255-289): `indices` maps each sub-batch slot to its
    flat node slot (host-selected, floor/_scene_ excluded); no triples reach
    the shape denoiser (`mp_valid=False`, mirroring the empty
    triples_selected of the reference's non-greedy branch).
    """
    sdf: Optional[jnp.ndarray]       # f32[M, R, R, R, 1] clamped SDF grids (channel-last)
    num_valid: jnp.ndarray           # i32[] scalar count of real sub-batch slots
    latent: Optional[jnp.ndarray] = None  # f32[M, r, r, r, z] precomputed VQ latents
    indices: Optional[jnp.ndarray] = None  # i32[M] node slot per sub-batch slot
    mp_valid: bool = struct.field(pytree_node=False, default=True)

    @property
    def capacity(self) -> int:
        src = self.sdf if self.sdf is not None else self.latent
        return src.shape[0]

    def mask(self) -> jnp.ndarray:
        return (jnp.arange(self.capacity) < self.num_valid).astype(jnp.float32)

    def gather_rows(self, x: jnp.ndarray) -> jnp.ndarray:
        """Select this sub-batch's rows from a per-node array."""
        if self.indices is None:
            return x[:self.capacity]
        return x[self.indices]


@struct.dataclass
class SceneBatch:
    """A full training/eval batch: paired encoder/decoder graph views + targets.

    Mirrors the output of the reference collate_fn plus the manipulation
    bookkeeping that train_3dfront.parse_data extracts (train_3dfront.py:70-139).
    """
    enc: GraphBatch
    dec: GraphBatch
    objs_grained: jnp.ndarray     # i32[N] fine-grained ids (balance sampling)
    obj_to_scene: jnp.ndarray     # i32[N]; padded slots -> num_scenes
    triple_to_scene: jnp.ndarray  # i32[T]
    boxes: jnp.ndarray            # f32[N, 7] scaled boxes, raw angle in slot 6
    change_flags: jnp.ndarray     # f32[N] 1 = node was added/manipulated (gets N(0,1) change code)
    enc_obj_mask: jnp.ndarray     # f32[N] 1 = node exists in the ENCODER view (0: "missing"/added)
    num_scenes: int = struct.field(pytree_node=False, default=1)
    shapes: Optional[ShapeSelection] = None

    @property
    def num_nodes(self) -> int:
        return self.boxes.shape[0]

    def scene_one_hot(self) -> jnp.ndarray:
        """f32[N, S] scene membership (padded nodes map to no scene)."""
        return (self.obj_to_scene[:, None] ==
                jnp.arange(self.num_scenes)[None, :]).astype(jnp.float32)

    def same_scene_matrix(self) -> jnp.ndarray:
        """f32[N, N] 1 where two (real) nodes share a scene, diagonal zeroed.

        Used by the optional IoU collision loss (diffusion_ddpm.py:412-418).
        """
        same = (self.obj_to_scene[:, None] == self.obj_to_scene[None, :])
        same = jnp.logical_and(same, (self.dec.obj_mask[:, None] *
                                      self.dec.obj_mask[None, :]) > 0)
        n = self.num_nodes
        return same.astype(jnp.float32) * (1.0 - jnp.eye(n, dtype=jnp.float32))
