"""MLP builder with mask-aware batch normalisation.

Behavioral reference: /root/reference/model/layers.py:21-38 (build_mlp: stacks
of Linear [+ BatchNorm1d] [+ ReLU/LeakyReLU] [+ Dropout], the final layer's
norm/activation gated by `final_nonlinearity`).

TPU twist: the reference batches graphs by flat concat, so BatchNorm1d sees
exactly the real rows.  Our batches are padded to static shapes, so plain
BatchNorm would fold padding rows into the statistics.  MaskedBatchNorm
computes moments with mask weights, making the padded implementation
numerically identical to the reference's on the real rows.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# PyTorch nn.Linear + kaiming_normal_ analogue (model/graph.py:31-34):
# variance_scaling(2.0, fan_in, normal) == kaiming_normal_ w/ default args.
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MaskedBatchNorm(nn.Module):
    """BatchNorm over axis 0 with sample weights; tracks running stats.

    Matches torch.nn.BatchNorm1d semantics (momentum 0.1, eps 1e-5, affine)
    restricted to rows where mask == 1.
    """
    momentum: float = 0.9   # running = momentum*running + (1-momentum)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=0)
                var = jnp.var(xf, axis=0)
                n = jnp.asarray(x.shape[0], jnp.float32)
            else:
                m = mask.astype(jnp.float32)[:, None]
                n = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=0) / n
                var = jnp.sum(((xf - mean) ** 2) * m, axis=0) / n
            if not self.is_initializing():
                # torch uses the unbiased variance for the running stats
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class MLP(nn.Module):
    """build_mlp equivalent over (N, C) rows.

    dims: full layer width list [in, h1, ..., out].
    """
    dims: Sequence[int]
    activation: str = "relu"
    batch_norm: str = "none"           # 'none' | 'batch'
    dropout: float = 0.0
    final_nonlinearity: bool = True
    kernel_init: str = "default"       # 'default' | 'kaiming'
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 *, train: bool = False, deterministic: bool = True) -> jnp.ndarray:
        n_layers = len(self.dims) - 1
        init = kaiming_normal if self.kernel_init == "kaiming" else \
            nn.initializers.lecun_normal()
        for i in range(n_layers):
            x = nn.Dense(self.dims[i + 1], kernel_init=init, dtype=self.dtype)(x)
            final_layer = i == n_layers - 1
            if not final_layer or self.final_nonlinearity:
                if self.batch_norm == "batch":
                    x = MaskedBatchNorm()(x, mask, train=train)
                if self.activation == "relu":
                    x = nn.relu(x)
                elif self.activation == "leakyrelu":
                    x = nn.leaky_relu(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x
