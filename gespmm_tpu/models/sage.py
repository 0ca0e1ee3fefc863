"""GraphSAGE on the SpMM primitive.

Capability parity with the reference's DGL benchmark surface
(`dgl-custom/benchmark/sage/sage_dgl.py`): stock SAGEConv layers with
`--aggregator-type` ∈ {mean, gcn, pool, lstm}.  mean/gcn/pool map to SpMM
reductions; lstm is a per-node scan over a degree-bucketed neighbor list and
is implemented separately (models/sage_lstm.py) since it is not an SpMM.

SAGEConv semantics (matching DGL):
  mean:  h = W_self·x + W_neigh·mean_agg(x)
  gcn:   h = W_neigh·(sym-norm agg including self)      (no separate W_self)
  pool:  h = W_self·x + W_neigh·max_agg(relu(W_pool·x + b_pool))
followed by optional bias, activation, and L2 normalization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax

from gespmm_tpu.models.common import dense_apply, dense_init, dropout
from gespmm_tpu.ops.graph import gcn_aggregate
from gespmm_tpu.ops.spmm import Adjacency, spmm

Array = jax.Array


def sage_conv_init(key, in_dim, out_dim, aggregator="mean", bias=True):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {}
    if aggregator == "gcn":
        p["neigh"] = dense_init(k1, in_dim, out_dim, bias=bias)
    else:
        p["self"] = dense_init(k1, in_dim, out_dim, bias=False)
        p["neigh"] = dense_init(k2, in_dim, out_dim, bias=bias)
    if aggregator == "pool":
        p["pool"] = dense_init(k3, in_dim, in_dim, bias=True)
    if aggregator == "lstm":
        from gespmm_tpu.models.sage_lstm import lstm_cell_init

        p["lstm"] = lstm_cell_init(k3, in_dim, in_dim)
    return p


def sage_conv_apply(
    p, adj: Adjacency, x: Array, aggregator="mean", method="auto",
    neighbor_table=None,
):
    if aggregator == "lstm":
        from gespmm_tpu.models.sage_lstm import lstm_aggregate

        if neighbor_table is None:
            raise ValueError(
                "aggregator='lstm' needs a neighbor_table "
                "(models.sage_lstm.build_neighbor_table)"
            )
        nbrs, mask = neighbor_table
        agg = lstm_aggregate(p["lstm"], x, nbrs, mask)
        return dense_apply(p["self"], x) + dense_apply(p["neigh"], agg)
    if aggregator == "mean":
        agg = spmm(adj, x, reduce="mean", method=method)
        return dense_apply(p["self"], x) + dense_apply(p["neigh"], agg)
    if aggregator == "gcn":
        agg = gcn_aggregate(adj, x, method=method)
        return dense_apply(p["neigh"], agg)
    if aggregator == "pool":
        pre = jax.nn.relu(dense_apply(p["pool"], x))
        agg = spmm(adj, pre, reduce="max", method=method)
        return dense_apply(p["self"], x) + dense_apply(p["neigh"], agg)
    if aggregator == "sum":
        agg = spmm(adj, x, reduce="sum", method=method)
        return dense_apply(p["self"], x) + dense_apply(p["neigh"], agg)
    raise ValueError(f"unknown aggregator {aggregator!r}")


@dataclasses.dataclass(frozen=True)
class GraphSAGE:
    """n-layer GraphSAGE. `dims = [in, hidden..., out]`.

    For `aggregator="lstm"` attach a per-graph neighbor table
    (`models.sage_lstm.build_neighbor_table`) — either here or per call.
    """

    dims: Sequence[int]
    aggregator: str = "mean"
    dropout_rate: float = 0.5
    method: str = "auto"
    neighbor_table: object = dataclasses.field(
        default=None, compare=False, hash=False
    )

    @property
    def n_layers(self) -> int:
        return len(self.dims) - 1

    def init(self, key) -> dict:
        keys = jax.random.split(key, self.n_layers)
        return {
            f"layer_{i}": sage_conv_init(
                keys[i], self.dims[i], self.dims[i + 1], self.aggregator
            )
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
        neighbor_table=None,
    ) -> Array:
        h = x
        for i in range(self.n_layers):
            if training and rng is not None:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout_rate, training)
            h = sage_conv_apply(
                params[f"layer_{i}"], adj, h, self.aggregator, self.method,
                neighbor_table=(
                    neighbor_table
                    if neighbor_table is not None
                    else self.neighbor_table
                ),
            )
            if i < self.n_layers - 1:
                h = jax.nn.relu(h)
        return h

    def log_probs(self, params, adj, x, **kw) -> Array:
        return jax.nn.log_softmax(self.apply(params, adj, x, **kw), axis=-1)
