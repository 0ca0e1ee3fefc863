#!/usr/bin/env python
"""Round-2 multi-tile tuning batch: measure candidate (col_tile, R, E)
plans on rmat18/rmat20 and sanity-check the small-graph regime.
Self-limiting (prints progress; each stage bounded)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gespmm_tpu.kernels import spmm_stream as ss
from gespmm_tpu.sparse.partition import build_tiled_plan
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import rmat_graph, load_mtx_graph, find_graph

t_start = time.time()


def bench_plan(csr, label, K=128, mode="trilo", iters=8, **kw):
    m, n = csr.shape
    flops = 2.0 * csr.nnz * K
    plan = build_tiled_plan(csr, k_hint=K, **kw)
    B = jnp.asarray(
        (np.random.default_rng(0).standard_normal((n, K)) * 0.01)
        .astype(np.float32)
    )
    fn = lambda x: ss.spmm_tiled(plan, None, x, m, mode=mode) * 0.5
    r = timing.benchmark_chained(fn, B, iters=iters, groups=3)
    print(f"{label:34s} K={K} slots={plan.num_slots/1e6:5.2f}M "
          f"pad={plan.padding_ratio:.3f} {r.median_s*1e3:8.2f} ms "
          f"{flops/r.median_s/1e9:6.1f} GF/s  [t+{time.time()-t_start:.0f}s]",
          flush=True)
    return r.median_s


which = sys.argv[1] if len(sys.argv) > 1 else "r18"

if which == "r18":
    csr = rmat_graph(scale=18, edge_factor=16, seed=0)
    bench_plan(csr, "auto (new)")
    bench_plan(csr, "ct16384 R128 E64", col_tile=16384, rows_per_block=128,
               chunk_nnz=64)
    bench_plan(csr, "ct16384 R96 E64", col_tile=16384, rows_per_block=96,
               chunk_nnz=64)
    bench_plan(csr, "ct16384 R144 E64", col_tile=16384, rows_per_block=144,
               chunk_nnz=64)
    bench_plan(csr, "ct16384 R256 E128", col_tile=16384, rows_per_block=256,
               chunk_nnz=128)
    bench_plan(csr, "ct16384 R256 E256 (r1best)", col_tile=16384,
               rows_per_block=256, chunk_nnz=256)
elif which == "r18b":
    csr = rmat_graph(scale=18, edge_factor=16, seed=0)
    bench_plan(csr, "ct65536 R64 E128", col_tile=65536, rows_per_block=64,
               chunk_nnz=128)
    bench_plan(csr, "ct65536 R128 E256", col_tile=65536, rows_per_block=128,
               chunk_nnz=256)
    bench_plan(csr, "ct32768 R128 E128", col_tile=32768, rows_per_block=128,
               chunk_nnz=128)
    bench_plan(csr, "K512 ct16384 R128 E128", K=512, col_tile=16384,
               rows_per_block=128, chunk_nnz=128)
    bench_plan(csr, "K512 auto", K=512)
elif which == "r20":
    csr = rmat_graph(scale=20, edge_factor=16, seed=0)
    bench_plan(csr, "auto (round1)", iters=4)
    bench_plan(csr, "ct65536 R128 E128", col_tile=65536, rows_per_block=128,
               chunk_nnz=128, iters=4)
    bench_plan(csr, "ct65536 R64 E64", col_tile=65536, rows_per_block=64,
               chunk_nnz=64, iters=4)
elif which == "small":
    for name, scale in (("pubmed", None), ("rmat14", 14), ("rmat16", 16)):
        csr = (load_mtx_graph(name, binary=True) if find_graph(name)
               else rmat_graph(scale=scale, edge_factor=16, seed=0))
        bench_plan(csr, f"{name} auto")
        bench_plan(csr, f"{name} R128 E128", rows_per_block=128,
                   chunk_nnz=128)
        bench_plan(csr, f"{name} R64 E64", rows_per_block=64, chunk_nnz=64)
print("DONE", flush=True)
