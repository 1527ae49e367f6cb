"""Device-mesh construction and batch sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.5); all scaling here
is new, TPU-native design: a ('data',) or ('data', 'model') mesh over ICI,
scenes sharded on 'data' (each data shard is an independent flat graph batch —
graph locality means no cross-shard edges by construction), parameters
replicated by default with optional tensor-parallel sharding of the shape
UNet's attention/FF matmuls over 'model'.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axis_names) - 1)
    total = int(np.prod(axis_sizes))
    assert total <= len(devices), (axis_sizes, len(devices))
    arr = np.asarray(devices[:total]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def stack_shards(batches) -> object:
    """Stack per-device pytrees on a new leading axis (host-side numpy)."""
    import numpy as np
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_stacked(tree, mesh: Mesh, axis: str = "data"):
    """Commit a stacked pytree's leading axis to `axis` of the mesh (GSPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
