"""Distributed SpMM: row-partitioned CSR with feature exchange collectives.

The simple all-gather formulation, kept as the reference tier and for
max/min-with-model-axis cases; the SCALABLE formulation (exchange only
the halo rows each shard needs, per-chip memory n/P·K + halo·K) lives in
`parallel.halo` and is what the sharded train step uses.  Pattern:

  forward:  all_gather(B, "data")  → local CSR slab × full B → local C slab
  backward: automatic — the transpose of all_gather is psum_scatter, so
            grad_B comes back reduce-scattered across the same axis with no
            hand-written comm code.

The "model" axis shards the feature dimension K; SpMM is embarrassingly
parallel across it (the gathered B shard is (n, K/model)).

Partitioning is a host-side pre-pass (`partition_adjacency`): equal row
slabs, per-slab CSR padded to a common nnz so every shard has identical
static shapes (a `shard_map` requirement — and the moral equivalent of the
reference's per-matrix kernel specialization).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gespmm_tpu.sparse.formats import CSR
from gespmm_tpu.ops import reference as ref

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PartitionedAdjacency:
    """Row-slab partitioned CSR, stacked with a leading parts axis.

    indptr:  (parts, rows_per_part + 1) int32 — local row offsets
    indices: (parts, nnz_pad) int32 — GLOBAL column ids (pad -> 0)
    data:    (parts, nnz_pad) values or None (pad -> 0)
    mask:    (parts, nnz_pad) bool — False on padded slots
    shape:   static global (m, n); rows_per_part static.
    """

    indptr: Array
    indices: Array
    data: Optional[Array]
    mask: Array
    shape: Tuple[int, int]
    rows_per_part: int

    def tree_flatten(self):
        if self.data is None:
            return (self.indptr, self.indices, self.mask), (
                self.shape,
                self.rows_per_part,
                False,
            )
        return (self.indptr, self.indices, self.data, self.mask), (
            self.shape,
            self.rows_per_part,
            True,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, rpp, has_data = aux
        if has_data:
            indptr, indices, data, mask = children
        else:
            (indptr, indices, mask), data = children, None
        return cls(indptr, indices, data, mask, shape, rpp)

    @property
    def num_parts(self) -> int:
        return int(self.indptr.shape[0])


def partition_adjacency(csr: CSR, num_parts: int) -> PartitionedAdjacency:
    """Host-side equal-row-slab partitioner with per-slab nnz padding."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = None if csr.data is None else np.asarray(csr.data)
    m, n = csr.shape
    rpp = (m + num_parts - 1) // num_parts

    slabs = []
    max_nnz = 1
    for p in range(num_parts):
        r0, r1 = p * rpp, min((p + 1) * rpp, m)
        s, e = int(indptr[min(r0, m)]), int(indptr[min(r1, m)])
        local_ptr = indptr[r0 : r1 + 1] - s if r1 > r0 else np.zeros(1, np.int64)
        # pad row dimension of indptr for short final slab
        if r1 - r0 < rpp:
            pad_rows = rpp - (r1 - r0)
            local_ptr = np.concatenate(
                [local_ptr, np.full(pad_rows, local_ptr[-1])]
            )
        slabs.append((local_ptr, indices[s:e], None if data is None else data[s:e]))
        max_nnz = max(max_nnz, e - s)

    P_ = num_parts
    out_ptr = np.zeros((P_, rpp + 1), np.int32)
    out_idx = np.zeros((P_, max_nnz), np.int32)
    out_mask = np.zeros((P_, max_nnz), bool)
    out_data = None if data is None else np.zeros((P_, max_nnz), data.dtype)
    for p, (lp, li, ld) in enumerate(slabs):
        out_ptr[p] = lp
        out_idx[p, : li.shape[0]] = li
        out_mask[p, : li.shape[0]] = True
        if out_data is not None:
            out_data[p, : li.shape[0]] = ld

    return PartitionedAdjacency(
        indptr=jnp.asarray(out_ptr),
        indices=jnp.asarray(out_idx),
        data=None if out_data is None else jnp.asarray(out_data),
        mask=jnp.asarray(out_mask),
        shape=(m, n),
        rows_per_part=rpp,
    )


def _local_spmm(indptr, indices, data, mask, B_full, rpp, reduce):
    """Per-shard SpMM over the local row slab with global column ids.

    Padded slots (positions past indptr[-1]) are routed to a phantom row
    appended after the slab, so they cannot pollute any real row under ANY
    reduction monoid; the phantom row is sliced off.
    """
    nnz_pad = indices.shape[0]
    vals = mask.astype(B_full.dtype) if data is None else data * mask
    indptr_ext = jnp.concatenate(
        [indptr, jnp.full((1,), nnz_pad, indptr.dtype)]
    )
    out = ref.spmm_xla(indptr_ext, indices, vals, B_full, reduce=reduce)
    return out[:rpp]


def dist_spmm(
    padj: PartitionedAdjacency,
    B: Array,
    mesh: Mesh,
    *,
    reduce: str = "sum",
    axis: str = "data",
    model_axis: Optional[str] = "model",
) -> Array:
    """C = A @ B with A row-partitioned and B row-sharded over `axis`.

    B: (n, K) sharded P(axis, model_axis); result (m_pad, K) sharded the
    same way.  Differentiable (shard_map transposes the all_gather into a
    psum_scatter automatically).
    """
    rpp = padj.rows_per_part
    m, n = padj.shape

    model_in_mesh = model_axis if (model_axis in mesh.axis_names) else None

    in_specs = (
        P(axis, None),  # indptr stacked over parts
        P(axis, None),  # indices
        *(() if padj.data is None else (P(axis, None),)),
        P(axis, None),  # mask
        P(axis, model_in_mesh),  # B row-sharded
    )
    out_spec = P(axis, model_in_mesh)

    def body(indptr, indices, *rest):
        if padj.data is None:
            data = None
            mask, B_shard = rest
        else:
            data, mask, B_shard = rest
        # Halo exchange: gather the full (n, K/model) feature block over the
        # data axis. tiled=True concatenates along rows.
        B_full = jax.lax.all_gather(B_shard, axis, axis=0, tiled=True)
        out = _local_spmm(
            indptr[0], indices[0],
            None if data is None else data[0],
            mask[0], B_full, rpp, reduce,
        )
        return out

    args = [padj.indptr, padj.indices]
    if padj.data is not None:
        args.append(padj.data)
    args += [padj.mask, B]

    fn = shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
    return fn(*args)


def dist_spmm_jit(padj, B, mesh, **kw):
    return jax.jit(partial(dist_spmm, mesh=mesh, **kw))(padj, B)
