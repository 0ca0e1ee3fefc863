#!/usr/bin/env python
"""Max-reduce SpMM tier sweep: aligned (scan-free) vs scan kernel vs XLA.

Round 5: the row-aligned layout (sparse/partition.AlignedMinmaxPlan)
replaces the in-kernel segmented scan on single-table graphs; this sweep
records the three tiers side by side so the dispatch choice stays
measured.  The aligned tier only exists where the whole-operand gather
table fits the fast tier (n*4*K <= 44MB) — larger graphs record nan for
it and ride the scan kernel, which is exactly what `spmm(reduce="max")`
dispatches.  Every cell validates against a float64 dense-oracle row
max.

Usage: python scripts/minmax_sweep.py --graphs pubmed grid256 --k 128 \
           --csv bench_results/minmax_sweep.csv
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def bench_graph_minmax(name, ks, csv_file=None, iters=24, tol=2e-3):
    import jax
    import jax.numpy as jnp

    from gespmm_tpu.bench.spmm_bench import _append_csv
    from gespmm_tpu.ops.spmm import Adjacency, spmm
    from gespmm_tpu.utils import timing
    from gespmm_tpu.utils.datasets import (
        find_graph, load_mtx_graph, synth_graph,
    )

    if find_graph(name):
        csr = load_mtx_graph(name, binary=True)
    else:
        csr = synth_graph(name)
        if csr is None:
            raise FileNotFoundError(name)
    m, n = csr.shape
    rng = np.random.default_rng(0)
    indptr_h = np.asarray(csr.indptr)
    idx_h = np.asarray(csr.indices)
    rows_h = np.repeat(np.arange(m), np.diff(indptr_h))
    row = {"data": name, "m": m, "n": n, "nnz": csr.nnz}
    for K in ks:
        adj_aligned = Adjacency.from_csr(csr, plan=True, k_hint=K,
                                         plan_transpose=False)
        adj_scan = Adjacency.from_csr(csr, plan=True, k_hint=K,
                                      plan_transpose=False,
                                      minmax_aligned=False)
        adj_plain = Adjacency.from_csr(csr)
        B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
        Bn = np.asarray(B).astype(np.float64)
        hi = np.full((m, K), -np.inf)
        np.maximum.at(hi, rows_h, Bn[idx_h])
        golden = np.where(np.isfinite(hi), hi, 0.0)
        tiers = [("aligned", adj_aligned, "tiled"),
                 ("scan", adj_scan, "tiled"),
                 ("xla", adj_plain, "xla")]
        if adj_aligned.plan.minmax is None:
            tiers[0] = ("aligned", None, None)  # table too big: nan cell
        for tname, adj, meth in tiers:
            key = f"K={K}-max-{tname}-gflops"
            if adj is None:
                row[key] = float("nan")
                continue
            try:
                fn = jax.jit(
                    lambda b, _a=adj, _m=meth: spmm(_a, b, reduce="max",
                                                    method=_m))
                got = np.asarray(fn(B)).astype(np.float64)
                err = float((np.abs(got - golden)
                             / (1.0 + np.abs(golden))).max())
                assert err < tol, f"{name} K={K} {tname} err={err:.2e}"
                # Bench convention (gespmm_tpu/bench/spmm_bench.py):
                # small graphs close over the adjacency (argument
                # marshalling dominates the kernel there); big graphs
                # pass it as a jit argument (inlined plan literals blow
                # the remote compile payload).
                if csr.nnz > 4_000_000:
                    r = timing.benchmark_chained(
                        lambda a, v, _m=meth: v + jnp.sum(
                            spmm(a, v, reduce="max", method=_m)) * 1e-30,
                        B, iters=iters, consts=adj,
                    )
                else:
                    r = timing.benchmark_chained(
                        lambda v, _a=adj, _m=meth: v + jnp.sum(
                            spmm(_a, v, reduce="max", method=_m)) * 1e-30,
                        B, iters=iters,
                    )
                row[key] = round(
                    timing.spmm_flops(csr.nnz, K) / r.median_s / 1e9, 2
                )
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                print(f"[minmax {name}] {tname} K={K}: {e}",
                      file=sys.stderr, flush=True)
                row[key] = float("nan")
        adj_aligned = adj_scan = None
        jax.clear_caches()
    if csv_file:
        _append_csv(csv_file, row)
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--graphs", nargs="+", default=["pubmed"])
    p.add_argument("--k", nargs="+", type=int, default=[128])
    p.add_argument("--csv", default=None)
    p.add_argument("--iters", type=int, default=24)
    a = p.parse_args(argv)
    for g in a.graphs:
        bench_graph_minmax(g, a.k, csv_file=a.csv, iters=a.iters)


if __name__ == "__main__":
    main()
