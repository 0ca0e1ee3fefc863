"""GCN — graph convolutional network on the SpMM primitive.

Capability parity with the reference training apps:
  * `pytorch-custom/op.py:77-152` (GCNConv: x·W → 1/√deg_out scale → SpMM →
    1/√deg_in scale → +bias, with cached norm vectors)
  * `pytorch-custom/gcn_custom.py` / `gcn_custom_2layer.py` (2- and 3-layer
    nets, ReLU + dropout, log-softmax head)

Pure-functional: `GCN.init(key)` returns a params pytree,
`GCN.apply(params, adj, x, ...)` returns logits.  The degree-norm vectors
are computed once at model construction (the reference caches them per
graph, `op.py:122-137`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax

from gespmm_tpu.models.common import dense_apply, dense_init, dropout
from gespmm_tpu.ops.graph import degree_norm
from gespmm_tpu.ops.spmm import Adjacency, spmm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GCN:
    """n-layer GCN.  `dims = [in, hidden..., out]`."""

    dims: Sequence[int]
    dropout_rate: float = 0.5
    bias: bool = True
    method: str = "auto"  # SpMM kernel dispatch
    # Optional per-graph cached (out_norm, in_norm) — the analogue of the
    # reference's cached norm vectors (`op.py:122-137`).  Attach with
    # `model.with_norms(adj)` so training steps skip the degree reduction.
    norms: object = dataclasses.field(default=None, compare=False, hash=False)

    def with_norms(self, adj: "Adjacency") -> "GCN":
        return dataclasses.replace(self, norms=degree_norm(adj))

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

    def apply(
        self,
        params: dict,
        adj: Adjacency,
        x: Array,
        *,
        norms=None,
        training: bool = False,
        rng: Optional[Array] = None,
    ) -> Array:
        """Forward pass -> logits (pre-softmax).

        `norms`: optional precomputed (out_norm, in_norm) pair; computed on
        the fly otherwise (cache it for training loops).
        """
        if norms is None:
            norms = self.norms if self.norms is not None else degree_norm(adj)
        out_norm, in_norm = norms
        h = x
        for i in range(self.n_layers):
            # Dense transform FIRST (shrinks the feature dim before the
            # aggregation when hidden < in, exactly as op.py:113 does the
            # matmul before the SpMM).
            h = dense_apply({"w": params[f"layer_{i}"]["w"]}, h)
            h = h * in_norm[:, None].astype(h.dtype)
            h = spmm(adj, h, reduce="sum", method=self.method)
            h = h * out_norm[:, None].astype(h.dtype)
            if "b" in params[f"layer_{i}"]:
                h = h + params[f"layer_{i}"]["b"]
            if i < self.n_layers - 1:
                h = jax.nn.relu(h)
                if training and rng is not None:
                    rng, sub = jax.random.split(rng)
                    h = dropout(sub, h, self.dropout_rate, training)
        return h

    def log_probs(self, params, adj, x, **kw) -> Array:
        return jax.nn.log_softmax(self.apply(params, adj, x, **kw), axis=-1)
