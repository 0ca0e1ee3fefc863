"""GAT — graph attention network composed from our SDDMM/SpMM primitives.

Beyond the reference's model zoo (it has GCN + SAGE), but the natural
consumer of its SDDMM op (which the reference exposes but never uses in a
model, SURVEY §3.5): attention logits are an SDDMM over the edge pattern,
normalization is edge-softmax, and aggregation is a value-weighted SpMM —
every hot op routes through the framework's kernels and their VJPs
(including the edge-value gradients the reference cannot take).

Single-head GAT layer (GATv1-style additive attention):
  e_ij  = LeakyReLU(a_src · (W h_i) + a_dst · (W h_j))
  α_ij  = softmax_j over i's in-edges
  h'_i  = Σ_j α_ij (W h_j)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gespmm_tpu.models.common import dense_init, dropout, glorot
from gespmm_tpu.ops.graph import edge_softmax
from gespmm_tpu.ops.spmm import Adjacency, spmm

Array = jax.Array


def gat_layer_init(key, in_dim: int, out_dim: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": glorot(k1, (in_dim, out_dim)),
        "a_src": glorot(k2, (out_dim, 1))[:, 0],
        "a_dst": glorot(k3, (out_dim, 1))[:, 0],
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def gat_layer_apply(
    p: dict,
    adj: Adjacency,
    x: Array,
    *,
    negative_slope: float = 0.2,
    method: str = "auto",
) -> Array:
    h = x @ p["w"]  # (n, out)
    # Additive attention decomposes into per-node terms; the edge logits
    # are src_score[row] + dst_score[col] — expressed directly (two
    # gathers + per-node segment-sum gradients) rather than as the
    # equivalent rank-2 SDDMM, whose generic VJP runs two K=2 SpMMs
    # (measured ~6 ms/layer on pubmed).
    src_score = h @ p["a_src"]  # (n,)
    dst_score = h @ p["a_dst"]
    from gespmm_tpu.sparse.partition import TiledSpmmPlan

    if (
        method in ("auto", "tiled")
        and isinstance(adj.plan, TiledSpmmPlan)
        and isinstance(adj.plan_t, TiledSpmmPlan)
    ):
        # Fused slot-space chain (kernels/gat_fused): 2 stream passes
        # forward, 2 backward, zero nnz-order permutes — replaces the
        # separate logits/softmax/weighted-SpMM ops (the round-2 GAT
        # wall was their CSR<->slot layout churn).
        from gespmm_tpu.kernels.gat_fused import gat_attention_aggregate

        out = gat_attention_aggregate(
            adj, src_score, dst_score, h, negative_slope=negative_slope
        )
        return out + p["b"]
    from gespmm_tpu.ops.graph import additive_attention_logits

    logits = additive_attention_logits(adj, src_score, dst_score)
    logits = jax.nn.leaky_relu(logits, negative_slope)
    alpha = edge_softmax(adj, logits)
    out = spmm(adj.with_data(alpha), h, reduce="sum", method=method)
    return out + p["b"]


@dataclasses.dataclass(frozen=True)
class GAT:
    """n-layer single-head GAT. `dims = [in, hidden..., out]`."""

    dims: Sequence[int]
    dropout_rate: float = 0.5
    negative_slope: float = 0.2
    method: str = "auto"

    @property
    def n_layers(self) -> int:
        return len(self.dims) - 1

    def init(self, key) -> dict:
        keys = jax.random.split(key, self.n_layers)
        return {
            f"layer_{i}": gat_layer_init(keys[i], self.dims[i], self.dims[i + 1])
            for i in range(self.n_layers)
        }

    def apply(
        self,
        params: dict,
        adj: Adjacency,
        x: Array,
        *,
        training: bool = False,
        rng: Optional[Array] = None,
    ) -> Array:
        h = x
        for i in range(self.n_layers):
            if training and rng is not None:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout_rate, training)
            h = gat_layer_apply(
                params[f"layer_{i}"], adj, h,
                negative_slope=self.negative_slope, method=self.method,
            )
            if i < self.n_layers - 1:
                h = jax.nn.elu(h)
        return h

    def log_probs(self, params, adj, x, **kw) -> Array:
        return jax.nn.log_softmax(self.apply(params, adj, x, **kw), axis=-1)
