#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Metric: SpMM GFLOPs on pubmed at K=128 (the reference's flagship config:
`run_test.sh` sweeps K∈{128,256,512} on the SNAP corpus; pubmed is the
largest bundled graph).  `vs_baseline` compares our best kernel tier to the
XLA segment-reduce formulation — the same "custom kernel vs vendor library"
framing as gespmm-vs-cuSPARSE in `spmm_test.cu:714-762`.
"""

import json
import sys


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
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
    tiers = {}
    for method in ("xla", "pallas"):
        try:
            fn = jax.jit(lambda b, _m=method: spmm(adj, b, method=_m))
            r = timing.benchmark(lambda: fn(B), iters=100)
            tiers[method] = r.gflops(flops)
        except Exception:
            pass

    best = max(tiers.values())
    baseline = tiers.get("xla", best)
    print(
        json.dumps(
            {
                "metric": f"spmm_gflops_{name}_k{K}",
                "value": round(best, 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(best / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
