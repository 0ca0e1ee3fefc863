#!/usr/bin/env python
"""Microbenchmarks on the real TPU: where does SpMM time actually go?

Uses timing.benchmark_chained (data-dependent steps fused in one jit) so
numbers are pure device steady-state, free of the tunnel's per-dispatch
overhead (~150us) and fetch round-trip (~30ms).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gespmm_tpu.ops import reference as ref
from gespmm_tpu.ops.interop import csr_to_bcoo
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.sparse.formats import expand_indptr
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import find_graph, load_mtx_graph, rmat_graph


def bench(name, step, x0, flops=None, nbytes=None, iters=30):
    r = timing.benchmark_chained(step, x0, iters=iters)
    t = r.best_s
    gf = f" {flops / t / 1e9:8.1f} GF/s" if flops else ""
    bw = f" {nbytes / t / 1e9:8.1f} GB/s" if nbytes else ""
    print(f"  {name:34s} {t * 1e6:10.1f} us{gf}{bw}", flush=True)
    return t


def run(csr, gname, K=128):
    m, n = csr.shape
    nnz = csr.nnz
    print(f"== {gname}: m={m} n={n} nnz={nnz} K={K}", flush=True)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32) * 0.01)
    cols = jnp.asarray(csr.indices)
    rows = expand_indptr(csr.indptr, nnz)
    flops = 2.0 * nnz * K

    # raw gather: chain by slicing back to (n, K)
    bench(
        "take rows f32 (+slice copy)",
        lambda x: jnp.take(x, cols, axis=0)[:n] * 0.5,
        B,
        nbytes=nnz * K * 4,
    )
    bench(
        "take rows bf16",
        lambda x: jnp.take(x, cols, axis=0)[:n] * 0.5,
        B.astype(jnp.bfloat16),
        nbytes=nnz * K * 2,
    )

    # big-granule tile gather
    Ct = 256
    n_pad = ((n + Ct - 1) // Ct) * Ct
    nt = n_pad // Ct
    Bt = jnp.pad(B, ((0, n_pad - n), (0, 0))).reshape(nt, Ct, K)
    tile_ids = jnp.asarray(rng.integers(0, nt, size=nt).astype(np.int32))
    bench(
        f"tile gather ({nt}x{Ct}x{K})",
        lambda x: jnp.take(x, tile_ids, axis=0) * 0.5,
        Bt,
        nbytes=nt * Ct * K * 4,
    )

    adj_noplan = Adjacency.from_csr(csr)
    adj_perrow = Adjacency.from_csr(csr, plan="perrow")
    adj_grouped = Adjacency.from_csr(csr, plan="grouped")
    bcoo = csr_to_bcoo(csr)

    bench("spmm xla (gather+segsum)",
          lambda x: spmm(adj_noplan, x, method="xla") * 0.5, B, flops=flops)
    bench("spmm scatter-add",
          lambda x: ref.spmm_scatter_xla(rows, cols, None, x, m) * 0.5,
          B, flops=flops)
    bench("spmm pallas perrow",
          lambda x: spmm(adj_perrow, x, method="pallas") * 0.5, B,
          flops=flops)
    bench("spmm pallas grouped",
          lambda x: spmm(adj_grouped, x, method="pallas") * 0.5, B,
          flops=flops)
    bench("spmm bcoo (stock)", lambda x: (bcoo @ x) * 0.5, B, flops=flops)
    print(
        f"  grouped dedup={adj_grouped.plan.dedup_factor:.2f} "
        f"perrow chunks={adj_perrow.plan.num_chunks} "
        f"pad={adj_perrow.plan.padding_ratio:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    graphs = []
    if find_graph("pubmed"):
        graphs.append((load_mtx_graph("pubmed", binary=True), "pubmed"))
    graphs.append((rmat_graph(scale=18, edge_factor=8, seed=0), "rmat18"))
    for csr, gname in graphs:
        run(csr, gname)
