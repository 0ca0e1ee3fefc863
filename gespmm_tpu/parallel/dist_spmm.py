"""Distributed SpMM: row-partitioned CSR with feature exchange collectives.

The new capability over the single-GPU reference (SURVEY §2.3, §5.8): the
communication pattern its Gunrock baseline expresses as atomicAdd-into-
destination (`spmm_enactor.cuh:92-105`) becomes explicit XLA collectives
inside `shard_map`:

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
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


# ---------------------------------------------------------------------------
# Tiled stream plan per shard (the fast per-chip kernel under shard_map)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PartitionedTiledPlan:
    """Uniform per-slab stream-reduce plans, stacked over a parts axis.

    Every slab gets the SAME static layout (same col tiles, same chunk
    count per tile, padded to the per-tile maximum across slabs), which is
    what `shard_map` requires: one traced program serves all shards.

    Arrays (P parts, S slots, C chunks of E):
      src:        (P, S) int32 — slab-local edge index per slot (pad -> 0;
                  indexes the nnz-padded arrays of PartitionedAdjacency)
      lcols:      (P, S) int32 — column local to the slot's tile
      local_rows: (P, C, E) int32 — row - row_start; sentinel R on pads
      row_start:  (P, C) int32
    Static: tile_slices (col0, ncols, slot0, slot1), rows_per_part,
      m_pad (slab output rows incl. alignment), R, E, global shape.
    """

    src: Array
    lcols: Array
    local_rows: Array
    row_start: Array
    tile_slices: Tuple = dataclasses.field(default=())
    rows_per_part: int = 0
    m_pad: int = 0
    rows_per_block: int = 0
    chunk_nnz: int = 0
    shape: Tuple[int, int] = (0, 0)

    def tree_flatten(self):
        return (self.src, self.lcols, self.local_rows, self.row_start), (
            self.tile_slices, self.rows_per_part, self.m_pad,
            self.rows_per_block, self.chunk_nnz, self.shape,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def partition_tiled(
    csr: CSR,
    num_parts: int,
    col_tile: int = 16384,
    rows_per_block: Optional[int] = None,
    chunk_nnz: int = 256,
) -> PartitionedTiledPlan:
    """Host-side: build one stream plan per row slab, padded to a uniform
    static layout.  Pair with `partition_adjacency` (same slabbing) for the
    edge values."""
    from gespmm_tpu.sparse.partition import build_tiled_plan

    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    m, n = csr.shape
    rpp = (m + num_parts - 1) // num_parts
    E = int(chunk_nnz)

    if rows_per_block is None:
        n_tiles = max(-(-n // col_tile), 1)
        density = csr.nnz / max(m * n_tiles, 1)
        rows_per_block = int(
            min(1024, max(256, -(-int(1.6 * E / max(density, 1e-9)) // 8) * 8))
        )

    plans = []
    for p in range(num_parts):
        r0, r1 = p * rpp, min((p + 1) * rpp, m)
        s, e = int(indptr[min(r0, m)]), int(indptr[min(r1, m)])
        local_ptr = (indptr[r0 : r1 + 1] - s).astype(np.int32)
        if r1 - r0 < rpp:  # pad trailing slab to rpp rows
            local_ptr = np.concatenate(
                [local_ptr, np.full(rpp - (r1 - r0), local_ptr[-1], np.int32)]
            )
        slab = CSR(
            indptr=jnp.asarray(local_ptr),
            indices=jnp.asarray(indices[s:e]),
            data=None,
            shape=(rpp, n),
        )
        plan = build_tiled_plan(
            slab, col_tile=col_tile, rows_per_block=rows_per_block,
            chunk_nnz=E, part_rows=1 << 62,
        )
        if len(plan.parts) != 1:
            # build_tiled_plan clamps part rows so the reduce kernel's
            # VMEM-resident accumulator fits (~64MB / 128 lanes / 4B).
            max_rows = ((64 << 20) // (4 * 128) // 8) * 8
            raise ValueError(
                f"shard row slab of {rpp} rows exceeds the per-shard "
                f"limit of {max_rows} rows (the stream-reduce kernel's "
                f"VMEM accumulator budget); use >= "
                f"{-(-m // max_rows)} parts for this graph"
            )
        plans.append(plan.parts[0])

    # Unify: per tile, pad every slab to the max chunk count.
    tile_ids = sorted(
        {col0 // col_tile for pp in plans for col0, _, _, _ in pp.tile_slices}
    )
    per_tile_chunks = {}
    for t in tile_ids:
        cmax = 0
        for pp in plans:
            for col0, _, s0, s1 in pp.tile_slices:
                if col0 // col_tile == t:
                    cmax = max(cmax, (s1 - s0) // E)
        per_tile_chunks[t] = max(cmax, 1)

    # Pad the chunk count to CHUNK_GROUP so the reduce kernel can fold a
    # group of chunks per grid step (sentinel chunks are pure padding).
    from gespmm_tpu.sparse.partition import CHUNK_GROUP

    C = sum(per_tile_chunks.values())
    if C % CHUNK_GROUP:
        per_tile_chunks[tile_ids[-1]] += (-C) % CHUNK_GROUP
        C = sum(per_tile_chunks.values())
    S = C * E
    R = plans[0].rows_per_block
    m_pad = max(pp.m_pad for pp in plans)
    Pn = num_parts
    src = np.zeros((Pn, S), np.int32)
    lcols = np.zeros((Pn, S), np.int32)
    local_rows = np.full((Pn, C, E), R, np.int32)
    row_start = np.zeros((Pn, C), np.int32)
    tile_slices = []
    off_chunks = 0
    for t in tile_ids:
        ct = per_tile_chunks[t]
        col0 = t * col_tile
        ncols = min(col_tile, n - col0)
        tile_slices.append((col0, ncols, off_chunks * E, (off_chunks + ct) * E))
        for p, pp in enumerate(plans):
            for c0, _, s0, s1 in pp.tile_slices:
                if c0 // col_tile != t:
                    continue
                nch = (s1 - s0) // E
                chunk0 = s0 // E
                src[p, off_chunks * E : off_chunks * E + (s1 - s0)] = (
                    np.asarray(pp.src[s0:s1])
                )
                lcols[p, off_chunks * E : off_chunks * E + (s1 - s0)] = (
                    np.asarray(pp.lcols[s0:s1])
                )
                local_rows[p, off_chunks : off_chunks + nch] = np.asarray(
                    pp.local_rows[chunk0 : chunk0 + nch]
                )
                row_start[p, off_chunks : off_chunks + nch] = np.asarray(
                    pp.row_start[chunk0 : chunk0 + nch]
                )
        off_chunks += ct

    return PartitionedTiledPlan(
        src=jnp.asarray(src),
        lcols=jnp.asarray(lcols),
        local_rows=jnp.asarray(local_rows),
        row_start=jnp.asarray(row_start),
        tile_slices=tuple(tile_slices),
        rows_per_part=rpp,
        m_pad=m_pad,
        rows_per_block=R,
        chunk_nnz=E,
        shape=(m, n),
    )


def dist_spmm_tiled(
    padj: PartitionedAdjacency,
    tplan: PartitionedTiledPlan,
    B: Array,
    mesh: Mesh,
    *,
    axis: str = "data",
    model_axis: Optional[str] = "model",
    mode: str = "trilo",
) -> Array:
    """Row-partitioned SpMM with the per-chip stream-reduce kernel.

    Forward-only (benchmark / inference tier): training keeps the
    differentiable `dist_spmm` XLA path.  B sharded P(axis, model_axis);
    returns (num_parts*rows_per_part, K) sharded the same way.
    """
    from gespmm_tpu.kernels.spmm_stream import _reduce_part

    rpp = tplan.rows_per_part
    interpret = jax.default_backend() != "tpu"
    model_in_mesh = model_axis if (model_axis in mesh.axis_names) else None
    has_data = padj.data is not None

    def body(src, lcols, local_rows, row_start, data, B_shard):
        B_full = jax.lax.all_gather(B_shard, axis, axis=0, tiled=True)
        B_full = B_full.astype(jnp.float32)
        K = B_full.shape[1]
        # Single pass at the exact width when K fits one tile (a Pallas
        # block dim may equal the full array dim — no padding for K<128).
        K_pad = K if K <= 128 else -(-K // 128) * 128
        if K_pad != K:
            B_full = jnp.pad(B_full, ((0, 0), (0, K_pad - K)))
        vals = None if data is None else jnp.take(data[0], src[0], axis=0)
        pieces = []
        for col0, ncols, s0, s1 in tplan.tile_slices:
            g = jnp.take(
                B_full[col0 : col0 + ncols], lcols[0, s0:s1], axis=0
            )
            if vals is not None:
                g = g * vals[s0:s1, None]
            pieces.append(g)
        contrib = (
            pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
        )
        out = _reduce_part(
            contrib, local_rows[0], row_start[0], tplan.m_pad,
            tplan.rows_per_block, min(128, K_pad), mode, interpret,
        )
        return out[:rpp, :K].astype(B_shard.dtype)

    in_specs = (
        P(axis, None), P(axis, None), P(axis, None, None), P(axis, None),
        *((P(axis, None),) if has_data else (P(),)),
        P(axis, model_in_mesh),
    )
    out_spec = P(axis, model_in_mesh)

    data_arg = padj.data if has_data else jnp.zeros((1,), B.dtype)

    def body_wrap(src, lcols, lr, rs, data, Bs):
        return body(src, lcols, lr, rs, data if has_data else None, Bs)

    fn = shard_map(
        body_wrap, mesh=mesh,
        in_specs=in_specs, out_specs=out_spec, check_vma=False,
    )
    return fn(
        tplan.src, tplan.lcols, tplan.local_rows, tplan.row_start,
        data_arg, B,
    )
