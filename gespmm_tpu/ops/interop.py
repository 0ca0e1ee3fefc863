"""Interop with `jax.experimental.sparse` (BCOO/BCSR).

The reference's third integration surface is drop-in kernel replacement
inside DGL (`dgl-custom/binary_reduce_sum.cu:362-523`); the JAX-ecosystem
counterpart is the stock sparse library: these adapters let any code
holding a BCOO/BCSR matrix route through our kernels (and our ops return
matrices stock code can consume), and the benchmark harness uses
`bcoo_dot_general` as the "stock framework" baseline tier (the role stock
DGL/PyG play in `gcn_pyg.py` vs `gcn_custom.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gespmm_tpu.sparse.formats import COO, CSR, csr_from_coo

Array = jax.Array


def csr_from_bcoo(mat) -> CSR:
    """jax.experimental.sparse.BCOO -> our CSR (host-side canonicalize).

    Requires an unbatched 2-D BCOO; duplicates summed, entries sorted.
    """
    from jax.experimental import sparse as jsparse

    if not isinstance(mat, jsparse.BCOO):
        raise TypeError(f"expected BCOO, got {type(mat)}")
    if mat.ndim != 2 or mat.n_batch or mat.n_dense:
        raise ValueError("only plain 2-D BCOO supported")
    mat = mat.sum_duplicates()
    rows = np.asarray(mat.indices[:, 0])
    cols = np.asarray(mat.indices[:, 1])
    vals = np.asarray(mat.data)
    order = np.lexsort((cols, rows))
    coo = COO(
        row=jnp.asarray(rows[order].astype(np.int32)),
        col=jnp.asarray(cols[order].astype(np.int32)),
        data=jnp.asarray(vals[order]),
        shape=tuple(mat.shape),
    )
    return csr_from_coo(coo)


def csr_to_bcoo(csr: CSR):
    """Our CSR -> jax.experimental.sparse.BCOO."""
    from jax.experimental import sparse as jsparse

    coo = csr.to_coo()
    data = (
        jnp.ones((csr.nnz,), jnp.float32) if csr.data is None else csr.data
    )
    indices = jnp.stack([coo.row, coo.col], axis=1)
    return jsparse.BCOO((data, indices), shape=csr.shape)


def bcoo_spmm_baseline(csr: CSR, B: Array) -> Array:
    """Stock-library SpMM tier: BCOO @ dense via bcoo_dot_general."""
    return csr_to_bcoo(csr) @ B
