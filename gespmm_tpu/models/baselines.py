"""Stock-library model baselines for A/B benchmarking.

Capability parity with the reference's baseline scripts (`gcn_pyg.py` vs
`gcn_custom.py` — same model on the stock framework vs the custom kernels,
SURVEY §4.4): here the "stock framework" is `jax.experimental.sparse`
(BCOO), so `gcn_bench --impl bcoo` trains the identical GCN with the
vendor sparse matmul in place of our SpMM op.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gespmm_tpu.models.common import dense_apply, dense_init, dropout

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GCNBcoo:
    """GCN identical to models.gcn.GCN but aggregating via BCOO @ dense."""

    dims: Sequence[int]
    dropout_rate: float = 0.5
    bias: bool = True

    @property
    def n_layers(self) -> int:
        return len(self.dims) - 1

    def init(self, key) -> dict:
        keys = jax.random.split(key, self.n_layers)
        return {
            f"layer_{i}": dense_init(
                keys[i], self.dims[i], self.dims[i + 1], bias=self.bias
            )
            for i in range(self.n_layers)
        }

    def apply(self, params, adj, x, *, norms=None, training=False, rng=None):
        """`adj` here is (bcoo, out_norm, in_norm) — see from_adjacency."""
        bcoo, out_norm, in_norm = adj
        h = x
        for i in range(self.n_layers):
            h = h @ params[f"layer_{i}"]["w"]
            h = h * in_norm[:, None].astype(h.dtype)
            h = bcoo @ h
            h = h * out_norm[:, None].astype(h.dtype)
            if "b" in params[f"layer_{i}"]:
                h = h + params[f"layer_{i}"]["b"]
            if i < self.n_layers - 1:
                h = jax.nn.relu(h)
                if training and rng is not None:
                    rng, sub = jax.random.split(rng)
                    h = dropout(sub, h, self.dropout_rate, training)
        return h

    def log_probs(self, params, adj, x, **kw):
        return jax.nn.log_softmax(self.apply(params, adj, x, **kw), axis=-1)

    @staticmethod
    def from_adjacency(adj):
        """Convert our Adjacency into the (bcoo, norms) tuple this model
        consumes."""
        from gespmm_tpu.ops.graph import degree_norm
        from gespmm_tpu.ops.interop import csr_to_bcoo

        out_norm, in_norm = degree_norm(adj)
        return (csr_to_bcoo(adj.csr), out_norm, in_norm)
