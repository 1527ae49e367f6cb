"""Triplet scene-graph convolution on mask-padded flat batches.

Behavioral reference: /root/reference/model/graph.py:89-250.  Per layer:
  1. gather subject/object vectors for every triple,
  2. per-triple MLP net1 on [s ⊕ p ⊕ o] -> [new_s(H) ⊕ new_p(Dp) ⊕ new_o(H)],
  3. scatter-pool new_s/new_o back to nodes ('sum' | 'avg' with count clamped
     to >= 1 | 'wAvg' with learned sigmoid weights),
  4. node MLP net2 (H -> H -> Dout),
  5. optional residual projections for both node and predicate streams.

TPU mapping: the reference's `scatter_add` (graph.py:174-199) becomes a
one-hot × message matmul — on TPU a small MXU contraction beats a sorted
scatter, and it is trivially maskable (padded triples contribute an all-zero
one-hot row).  Node/edge counts are static; masks carry validity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .mlp import MLP, kaiming_normal


def scatter_sum_onehot(values: jnp.ndarray, idx: jnp.ndarray,
                       mask: Optional[jnp.ndarray], num_nodes: int) -> jnp.ndarray:
    """sum_{t: idx[t]==n, mask[t]=1} values[t]  via one-hot matmul.

    values: (T, D), idx: (T,) int, mask: (T,) or None -> (N, D).
    """
    onehot = (idx[:, None] == jnp.arange(num_nodes)[None, :]).astype(values.dtype)
    if mask is not None:
        onehot = onehot * mask.astype(values.dtype)[:, None]
    return jnp.einsum("tn,td->nd", onehot, values,
                      preferred_element_type=jnp.float32).astype(values.dtype)


class WeightNetGCN(nn.Module):
    """Learned scatter weights for 'wAvg' pooling (graph.py:37-86)."""
    feat_dim: int = 128
    separate_s_o: bool = True

    @nn.compact
    def __call__(self, s, p, o):
        s = nn.Dense(self.feat_dim, name="down_sample_obj")(s)
        o = nn.Dense(self.feat_dim, name="down_sample_obj_o")(o)
        p = nn.Dense(self.feat_dim, name="down_sample_pred")(p)
        feat = jnp.concatenate([s, o, p], axis=1)

        def head(name):
            h = nn.Dense(64, name=f"{name}_fc1")(feat)
            h = nn.relu(h)
            return nn.sigmoid(nn.Dense(1, name=f"{name}_fc2")(h))

        if self.separate_s_o:
            return head("net_s"), head("net_o")
        w = head("net")
        return w, w


class GraphTripleConv(nn.Module):
    """One scene-graph convolution layer (graph.py:89-211)."""
    input_dim_obj: int
    input_dim_pred: int
    output_dim: Optional[int] = None
    hidden_dim: int = 512
    pooling: str = "avg"            # 'sum' | 'avg' | 'wAvg'
    mlp_normalization: str = "none"
    residual: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, obj_vecs: jnp.ndarray, pred_vecs: jnp.ndarray,
                 edges: jnp.ndarray,
                 obj_mask: Optional[jnp.ndarray] = None,
                 triple_mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.pooling in ("sum", "avg", "wAvg")
        N = obj_vecs.shape[0]
        H = self.hidden_dim
        Dp = self.input_dim_pred
        # output_dim None -> keep the node width (graph.py:96-97); inferred
        # from the input so callers need not pre-compute concatenated widths
        Dout = self.output_dim or obj_vecs.shape[-1]

        s_idx, o_idx = edges[:, 0], edges[:, 1]
        cur_s = obj_vecs[s_idx]
        cur_o = obj_vecs[o_idx]
        t_in = jnp.concatenate([cur_s, pred_vecs, cur_o], axis=1)
        new_t = MLP([t_in.shape[-1], H, 2 * H + Dp],
                    batch_norm=self.mlp_normalization, kernel_init="kaiming",
                    dtype=self.dtype, name="net1")(
                        t_in, triple_mask, train=train)
        new_s = new_t[:, :H]
        new_p = new_t[:, H:H + Dp]
        new_o = new_t[:, H + Dp:]

        s_w = o_w = None
        if self.pooling == "wAvg":
            s_w, o_w = WeightNetGCN(128)(
                jax.lax.stop_gradient(new_s),
                jax.lax.stop_gradient(new_p),
                jax.lax.stop_gradient(new_o))
            new_s = s_w * new_s
            new_o = o_w * new_o

        pooled = (scatter_sum_onehot(new_s, s_idx, triple_mask, N) +
                  scatter_sum_onehot(new_o, o_idx, triple_mask, N))

        if self.pooling == "avg":
            ones = jnp.ones((edges.shape[0], 1), pooled.dtype)
            counts = (scatter_sum_onehot(ones, s_idx, triple_mask, N) +
                      scatter_sum_onehot(ones, o_idx, triple_mask, N))
            pooled = pooled / jnp.maximum(counts, 1.0)
        elif self.pooling == "wAvg":
            wsum = (scatter_sum_onehot(s_w, s_idx, triple_mask, N) +
                    scatter_sum_onehot(o_w, o_idx, triple_mask, N))
            pooled = pooled / (wsum + 1e-4)

        new_obj = MLP([H, H, Dout], batch_norm=self.mlp_normalization,
                      kernel_init="kaiming", dtype=self.dtype, name="net2")(
                          pooled, obj_mask, train=train)

        if self.residual:
            new_obj = new_obj + nn.Dense(Dout, name="proj_obj",
                                         dtype=self.dtype)(obj_vecs)
            new_p = new_p + nn.Dense(Dp, name="proj_pred",
                                     dtype=self.dtype)(pred_vecs)
        return new_obj, new_p


class GraphTripleConvNet(nn.Module):
    """Stack of GraphTripleConv layers; the last may change output_dim
    (graph.py:214-250)."""
    input_dim_obj: int
    input_dim_pred: int
    num_layers: int = 2
    hidden_dim: int = 512
    pooling: str = "avg"
    mlp_normalization: str = "none"
    residual: bool = False
    output_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, obj_vecs, pred_vecs, edges,
                 obj_mask=None, triple_mask=None, *, train: bool = False):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out_dim = self.output_dim if (last and self.output_dim is not None) else None
            obj_vecs, pred_vecs = GraphTripleConv(
                input_dim_obj=self.input_dim_obj,
                input_dim_pred=self.input_dim_pred,
                output_dim=out_dim,
                hidden_dim=self.hidden_dim,
                pooling=self.pooling,
                mlp_normalization=self.mlp_normalization,
                residual=self.residual,
                dtype=self.dtype,
                name=f"gconv_{i}")(
                    obj_vecs, pred_vecs, edges, obj_mask, triple_mask, train=train)
        return obj_vecs, pred_vecs
