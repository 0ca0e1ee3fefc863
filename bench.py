#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Metric: SpMM GFLOPs on pubmed at K=128 (the reference's flagship config:
`run_test.sh` sweeps K∈{128,256,512} on the SNAP corpus; pubmed is the
largest bundled graph).  `vs_baseline` compares our auto-dispatched op to
the stock JAX sparse library (`jax.experimental.sparse` BCOO) — the
"custom kernels vs vendor library" framing of gespmm-vs-cuSPARSE in
`spmm_test.cu:714-762`, with BCOO playing cuSPARSE's role on TPU.

Timing: `timing.benchmark_chained` — data-dependent iterations fused in a
single jit, fenced by a scalar fetch with the tunnel round-trip subtracted
(pure device steady-state; see utils/timing.py).
"""

import json
import sys


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from gespmm_tpu.ops.interop import csr_to_bcoo
    from gespmm_tpu.ops.spmm import Adjacency, spmm
    from gespmm_tpu.utils import timing
    from gespmm_tpu.utils.datasets import find_graph, load_mtx_graph, rmat_graph

    if find_graph("pubmed"):
        csr = load_mtx_graph("pubmed", binary=True)
        name = "pubmed"
    else:
        csr = rmat_graph(scale=15, edge_factor=8, seed=0)
        name = "rmat15"

    K = 128
    n = csr.shape[1]
    adj = Adjacency.from_csr(csr, plan=True)
    B = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, K)).astype(np.float32)
        * 0.01
    )

    flops = timing.spmm_flops(csr.nnz, K)
    ours = timing.benchmark_chained(
        lambda x: spmm(adj, x, method="auto") * 0.5, B, iters=100, groups=5
    )

    bcoo = csr_to_bcoo(csr)
    try:
        stock = timing.benchmark_chained(
            lambda x: (bcoo @ x) * 0.5, B, iters=100, groups=5
        )
        stock_t = stock.median_s
    except Exception:
        stock_t = ours.median_s

    gf = flops / ours.median_s / 1e9
    print(
        json.dumps(
            {
                "metric": f"spmm_gflops_{name}_k{K}",
                "value": round(gf, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(stock_t / ours.median_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
