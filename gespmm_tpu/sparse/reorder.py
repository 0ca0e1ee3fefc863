"""Graph reordering: locality-creating node permutations.

A capability the GPU reference never needed (warps tolerate random access;
TPU DMA gathers reward locality): renumber nodes so that neighboring nodes
get nearby ids, which (a) narrows each row-block's column window, (b) lets
the grouped-gather plan deduplicate aligned row-groups, and (c) improves
HBM page locality for the XLA gather tier.

Reorderings are symmetric permutations A' = P·A·Pᵀ computed ONCE at ingest;
models simply use the permuted node order end-to-end (features, labels and
masks permuted alongside), so there is zero runtime cost and results are
identical up to the permutation.

Methods:
  rcm     — reverse Cuthill-McKee (bandwidth minimizing; scipy.csgraph)
  degree  — descending degree sort (hub clustering)
  bfs     — plain BFS order from a max-degree seed
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gespmm_tpu.sparse.formats import CSR


def _to_scipy(csr: CSR):
    import scipy.sparse as sp

    data = (
        np.ones(csr.nnz, np.float32)
        if csr.data is None
        else np.asarray(csr.data)
    )
    return sp.csr_matrix(
        (data, np.asarray(csr.indices), np.asarray(csr.indptr)),
        shape=csr.shape,
    )


def reorder_permutation(csr: CSR, method: str = "rcm") -> np.ndarray:
    """Compute the permutation `perm` (new position -> old id)."""
    m, n = csr.shape
    if m != n:
        raise ValueError("reordering needs a square adjacency")
    if method == "degree":
        deg = np.diff(np.asarray(csr.indptr))
        return np.argsort(-deg, kind="stable")
    A = _to_scipy(csr)
    if method == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    if method == "bfs":
        from scipy.sparse.csgraph import breadth_first_order

        deg = np.diff(A.indptr)
        seen = np.zeros(m, bool)
        order = []
        # Cover all components, seeding each from its max-degree node.
        while len(order) < m:
            remaining = np.flatnonzero(~seen)
            seed = remaining[np.argmax(deg[remaining])]
            nodes = breadth_first_order(
                A, seed, directed=False, return_predecessors=False
            )
            nodes = [v for v in np.asarray(nodes) if not seen[v]]
            seen[np.asarray(nodes)] = True
            order.extend(nodes)
        return np.asarray(order)
    raise ValueError(f"unknown reordering {method!r}")


def apply_permutation(csr: CSR, perm: np.ndarray) -> CSR:
    """A' = P·A·Pᵀ with rows/cols renumbered by `perm` (new -> old)."""
    A = _to_scipy(csr)
    Ap = A[perm][:, perm].tocsr()
    Ap.sort_indices()
    out = CSR(
        indptr=jnp.asarray(Ap.indptr.astype(np.int32)),
        indices=jnp.asarray(Ap.indices.astype(np.int32)),
        data=None if csr.data is None else jnp.asarray(Ap.data),
        shape=csr.shape,
    )
    return out


def reorder(csr: CSR, method: str = "rcm") -> Tuple[CSR, np.ndarray]:
    """Returns (reordered CSR, perm).  new_x = x[perm]; old order is
    recovered with `inverse_permutation(perm)`."""
    perm = reorder_permutation(csr, method)
    return apply_permutation(csr, perm), perm


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return inv


def bandwidth_stats(csr: CSR, rows_per_block: int = 64) -> dict:
    """Locality diagnostics: matrix bandwidth + per-row-block column span."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    m = csr.shape[0]
    rows = np.repeat(np.arange(m), np.diff(indptr))
    bw = int(np.abs(rows - indices).max()) if indices.size else 0
    spans = []
    for b in range(0, m, rows_per_block):
        s, e = indptr[b], indptr[min(b + rows_per_block, m)]
        if e > s:
            spans.append(int(indices[s:e].max() - indices[s:e].min() + 1))
    spans = np.asarray(spans) if spans else np.zeros(1, int)
    return {
        "bandwidth": bw,
        "block_span_mean": float(spans.mean()),
        "block_span_p90": float(np.percentile(spans, 90)),
        "block_span_max": int(spans.max()),
    }
