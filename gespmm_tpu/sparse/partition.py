"""Row-block / nnz-chunk tile planner for the Pallas SpMM kernel.

TPU-native re-expression of the reference's two CUDA tricks (SURVEY §2.2):

  * Coalesced Row Caching (`spmm_test.cu:104-159`): a warp stages 32 nonzeros
    of its row into shared memory, then streams dense rows coalesced.  Here,
    each grid step owns a fixed-size chunk of E nonzeros belonging to one
    block of R output rows; the chunk's column ids drive an async-DMA gather
    of E rows of B from HBM into a VMEM buffer (double-buffered across grid
    steps), and the per-chunk reduction becomes a single MXU matmul
    P[R,E] @ G[E,K] where P scatters edge values to their local row.

  * Coarse-grained Warp Merging (`spmm_test.cu:161-454`): reuse of staged
    nonzeros across a wider feature tile.  Here each gathered chunk feeds the
    full K-tile at once (the MXU naturally amortizes the gather across all
    lanes), so "CF" generalizes to the K-tile width.

  * The fixed `tile_row=8` + K-heuristic dispatch (`spmm_kernel.cu:186-206`)
    becomes this *plan*: rows are grouped into blocks of R, each block's
    nonzeros padded to a multiple of E, so every grid step is a static-shape
    program.  Power-law mega-rows simply span many chunks of the same block
    and accumulate in VMEM (the "row splitting" the GPU never needed).

Plans are built once per graph on the host (NumPy) and carried in the
`Adjacency` pytree; they depend only on the sparsity *structure*, never on
edge values, so one plan serves every training step and every value of the
(differentiable) edge weights.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SpmmPlan:
    """Static-shape chunk layout for one sparsity structure.

    Arrays (C = num_chunks, E = nnz per chunk, R = rows per block):
      cols:       (C, E) int32 — column id per slot (pad slots -> 0)
      local_rows: (C, E) int32 — row id within the block; pad slots -> R
                  (sentinel outside [0, R) so padded slots contribute 0)
      src:        (C, E) int32 — CSR edge index feeding each slot (pad -> 0)
      block_ids:  (C,)   int32 — which row block each chunk accumulates into
      first:      (C,)   int32 — 1 iff chunk is the first of its row block
    Static: rows_per_block R, chunk_nnz E, shape (m, n), nnz, num_blocks.
    """

    cols: jax.Array
    local_rows: jax.Array
    src: jax.Array
    block_ids: jax.Array
    first: jax.Array
    rows_per_block: int
    chunk_nnz: int
    shape: Tuple[int, int]
    nnz: int
    num_blocks: int

    def tree_flatten(self):
        arrays = (self.cols, self.local_rows, self.src, self.block_ids, self.first)
        aux = (
            self.rows_per_block,
            self.chunk_nnz,
            self.shape,
            self.nnz,
            self.num_blocks,
        )
        return arrays, aux

    @classmethod
    def tree_unflatten(cls, aux, arrays):
        return cls(*arrays, *aux)

    @property
    def num_chunks(self) -> int:
        return int(self.cols.shape[0])

    @property
    def padded_rows(self) -> int:
        return self.num_blocks * self.rows_per_block

    @property
    def padding_ratio(self) -> float:
        """Padded-slot overhead (wasted gather fraction)."""
        total = self.num_chunks * self.chunk_nnz
        return (total - self.nnz) / max(total, 1)

    def chunk_data(self, data) -> jax.Array:
        """Reorder per-edge values (CSR order) into (C, E) chunk layout.

        Jittable; pad slots get 0 (they are additionally masked by the
        local_rows sentinel, so a 0 here is belt-and-braces).
        """
        vals = jnp.take(data, self.src.reshape(-1), axis=0)
        vals = vals.reshape(self.src.shape)
        return jnp.where(self.local_rows < self.rows_per_block, vals, 0)


def build_spmm_plan(
    csr,
    rows_per_block: int = 64,
    chunk_nnz: int = 64,
) -> SpmmPlan:
    """Build the chunk plan for one CSR structure (host-side, NumPy).

    rows_per_block (R): output rows owned by one accumulator block; must be a
      multiple of 8 (fp32 sublane).
    chunk_nnz (E): nonzeros gathered per grid step; controls DMA batch size.
    """
    if rows_per_block % 8:
        raise ValueError("rows_per_block must be a multiple of 8")
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    m, n = csr.shape
    nnz = int(indices.shape[0])
    R, E = rows_per_block, chunk_nnz

    num_blocks = max((m + R - 1) // R, 1)
    block_starts = indptr[np.minimum(np.arange(num_blocks) * R, m)]
    block_ends = indptr[np.minimum((np.arange(num_blocks) + 1) * R, m)]
    block_nnz = block_ends - block_starts
    chunks_per_block = np.maximum((block_nnz + E - 1) // E, 1)
    C = int(chunks_per_block.sum())

    cols = np.zeros((C, E), np.int32)
    local_rows = np.full((C, E), R, np.int32)
    src = np.zeros((C, E), np.int32)
    block_ids = np.zeros((C,), np.int32)
    first = np.zeros((C,), np.int32)

    # Per-edge row ids (vectorized indptr expansion).
    rows_of_edge = np.repeat(np.arange(m, dtype=np.int32), np.diff(indptr))

    chunk_offsets = np.concatenate([[0], np.cumsum(chunks_per_block)])
    for b in range(num_blocks):
        c0 = int(chunk_offsets[b])
        cnt = int(block_nnz[b])
        s = int(block_starts[b])
        ncb = int(chunks_per_block[b])
        block_ids[c0 : c0 + ncb] = b
        first[c0] = 1
        if cnt == 0:
            continue
        flat_cols = indices[s : s + cnt]
        flat_rows = rows_of_edge[s : s + cnt] - b * R
        flat_src = np.arange(s, s + cnt, dtype=np.int32)
        padded = ncb * E
        cols[c0 : c0 + ncb].reshape(-1)[:cnt] = flat_cols
        local_rows[c0 : c0 + ncb].reshape(-1)[:cnt] = flat_rows
        src[c0 : c0 + ncb].reshape(-1)[:cnt] = flat_src

    return SpmmPlan(
        cols=jnp.asarray(cols),
        local_rows=jnp.asarray(local_rows),
        src=jnp.asarray(src),
        block_ids=jnp.asarray(block_ids),
        first=jnp.asarray(first),
        rows_per_block=R,
        chunk_nnz=E,
        shape=(m, n),
        nnz=nnz,
        num_blocks=num_blocks,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GroupedSpmmPlan:
    """Group-deduplicated chunk layout (the locality-aware fast path).

    Instead of one DMA per nonzero, each chunk gathers its DISTINCT aligned
    G-row groups of B once (one DMA per group, G·K·4 bytes), and every edge
    reads its row from the staged buffer through a slot index.  On
    locality-reordered graphs (sparse/reorder.py) the dedup factor is ~2x+,
    which halves the descriptor count — the binding resource for scattered
    gathers on TPU (measured ~25-35ns/descriptor regardless of size below
    ~4KB).

    Arrays (C chunks, NG groups/chunk, E edges/chunk, S = NG*G slots):
      groups:     (C, NG) int32 — aligned group ids (pad -> 0)
      slots:      (C, E)  int32 — staged row per edge: pos(group)*G + col%G
      local_rows: (C, E)  int32 — row within block (pad -> R sentinel)
      src:        (C, E)  int32 — CSR edge index per slot (pad -> 0)
      block_ids:  (C,)    int32
      first:      (C,)    int32
    """

    groups: jax.Array
    slots: jax.Array
    local_rows: jax.Array
    src: jax.Array
    block_ids: jax.Array
    first: jax.Array
    rows_per_block: int
    edges_per_chunk: int
    groups_per_chunk: int
    group_rows: int
    shape: Tuple[int, int]
    nnz: int
    num_blocks: int

    def tree_flatten(self):
        arrays = (self.groups, self.slots, self.local_rows, self.src,
                  self.block_ids, self.first)
        aux = (self.rows_per_block, self.edges_per_chunk,
               self.groups_per_chunk, self.group_rows, self.shape,
               self.nnz, self.num_blocks)
        return arrays, aux

    @classmethod
    def tree_unflatten(cls, aux, arrays):
        return cls(*arrays, *aux)

    @property
    def num_chunks(self) -> int:
        return int(self.groups.shape[0])

    @property
    def dedup_factor(self) -> float:
        """Average edges served per gathered group slot (incl. padding)."""
        return self.nnz / max(self.num_chunks * self.groups_per_chunk, 1)

    def chunk_data(self, data) -> jax.Array:
        vals = jnp.take(data, self.src.reshape(-1), axis=0)
        vals = vals.reshape(self.src.shape)
        return jnp.where(self.local_rows < self.rows_per_block, vals, 0)


def build_grouped_plan(
    csr,
    rows_per_block: int = 64,
    edges_per_chunk: int = 64,
    groups_per_chunk: int = 32,
    group_rows: int = 8,
) -> "GroupedSpmmPlan":
    """Greedy chunk packing under BOTH limits (edges <= E, groups <= NG)."""
    if rows_per_block % 8:
        raise ValueError("rows_per_block must be a multiple of 8")
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    m, n = csr.shape
    nnz = int(indices.shape[0])
    R, E, NG, G = rows_per_block, edges_per_chunk, groups_per_chunk, group_rows
    num_blocks = max((m + R - 1) // R, 1)
    rows_of_edge = np.repeat(np.arange(m, dtype=np.int32), np.diff(indptr))

    chunks = []  # (block, groups list, edges: (local_row, slot, src))
    for b in range(num_blocks):
        s = int(indptr[min(b * R, m)])
        e = int(indptr[min((b + 1) * R, m)])
        pos = s
        first_of_block = True
        while pos < e or first_of_block:
            gmap = {}
            edges = []
            while pos < e and len(edges) < E:
                col = int(indices[pos])
                gid = col // G
                if gid not in gmap:
                    if len(gmap) == NG:
                        break
                    gmap[gid] = len(gmap)
                slot = gmap[gid] * G + col % G
                edges.append((int(rows_of_edge[pos]) - b * R, slot, pos))
                pos += 1
            chunks.append((b, list(gmap.keys()), edges, first_of_block))
            first_of_block = False

    C = len(chunks)
    # Shrink NG to the widest chunk actually produced: the kernel issues NG
    # DMA descriptors per chunk unconditionally, so unused group slots cost
    # real descriptors.
    NG = max(max((len(gl) for _, gl, _, _ in chunks), default=1), 1)
    groups = np.zeros((C, NG), np.int32)
    slots = np.zeros((C, E), np.int32)
    local_rows = np.full((C, E), R, np.int32)
    src = np.zeros((C, E), np.int32)
    block_ids = np.zeros((C,), np.int32)
    first = np.zeros((C,), np.int32)
    for c, (b, gl, edges, is_first) in enumerate(chunks):
        block_ids[c] = b
        first[c] = 1 if is_first else 0
        groups[c, : len(gl)] = gl
        for i, (lr, slot, sidx) in enumerate(edges):
            local_rows[c, i] = lr
            slots[c, i] = slot
            src[c, i] = sidx

    return GroupedSpmmPlan(
        groups=jnp.asarray(groups),
        slots=jnp.asarray(slots),
        local_rows=jnp.asarray(local_rows),
        src=jnp.asarray(src),
        block_ids=jnp.asarray(block_ids),
        first=jnp.asarray(first),
        rows_per_block=R,
        edges_per_chunk=E,
        groups_per_chunk=NG,
        group_rows=G,
        shape=(m, n),
        nnz=nnz,
        num_blocks=num_blocks,
    )
