"""SpMM / SDDMM benchmark harness — CSV sweep + roofline report.

Capability parity with the reference's standalone driver + sweep scripts
(`spmm_test.cu:495-826`, `run_test.sh`): for each graph and K, time the
kernel tiers and emit a CSV row

    data,K=<k>-xla-gflops,K=<k>-pallas-gflops,...

(schema shaped after `run_test.sh:3`, with our tier names in place of
cusparse/gespmm).  Metrics: GFLOPs = 2·nnz·K / t (`spmm_test.cu:728`) and
nnz/s.  Roofline: bytes moved ≈ nnz·(K+2)·4 + m·K·4 against measured
HBM stream bandwidth.

Run:  python -m gespmm_tpu.bench.spmm_bench --graphs pubmed cora --k 32 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

import numpy as np


def _append_csv(csv_file: str, row: dict) -> None:
    """Merge a row into the CSV: one row per graph (re-running a subset
    REPLACES that graph's row — the round-3 stale-duplicate defect), and
    the schema is the column UNION across runs (a partial re-run, e.g. a
    single graph with a method subset after a TPU-worker fault, merges
    into the existing file instead of wiping it)."""
    import csv as _csv

    rows = {}
    cols = []
    if os.path.exists(csv_file):
        with open(csv_file) as f:
            rdr = _csv.DictReader(f)
            cols = list(rdr.fieldnames or [])
            # A pre-existing CSV without the 'data' key column (foreign
            # format) would KeyError here and lose the just-measured
            # results — rewrite such a file from scratch instead.
            if "data" in cols:
                for r in rdr:
                    rows[r["data"]] = r
            else:
                cols = []
    for c in row:
        if c not in cols:
            cols.append(c)
    merged = rows.get(str(row["data"]), {})
    merged.update({k: str(v) for k, v in row.items()})
    rows[str(row["data"])] = merged
    with open(csv_file, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=cols, restval="nan")
        w.writeheader()
        for r in rows.values():
            w.writerow(r)


def bench_graph(
    name: str,
    ks: List[int],
    iters: int = 200,
    methods=("xla", "pallas"),
    rows_per_block: int = 64,
    chunk_nnz: int = 64,
    csv_file: Optional[str] = None,
    seed: int = 0,
    validate: bool = False,
    tol: float = 2e-3,
):
    import jax
    import jax.numpy as jnp

    from gespmm_tpu.ops.spmm import Adjacency, spmm
    from gespmm_tpu.utils import timing
    from gespmm_tpu.utils.datasets import (
        find_graph, load_mtx_graph, synth_graph,
    )

    if find_graph(name):
        csr = load_mtx_graph(name, binary=True)
    else:
        csr = synth_graph(name, seed=seed)
        if csr is None:
            raise FileNotFoundError(name)

    m, n = csr.shape
    # One adjacency per plan family: "tiled" wants the stream plan,
    # "pallas" the per-row DMA plan, everything else none.  Tiled plans
    # are built PER K (k_hint sizes the gather tables; a plan laid out
    # for K=128 quadruples its table bytes at K=512 and falls off the
    # fast-gather tier — measured rmat16 K=512 51.7 -> 62.6 GF/s with
    # the K-hinted plan).  Models know their width up front the same
    # way (pass k_hint to Adjacency.from_csr).
    adjs = {}
    base_adj = Adjacency.from_csr(csr)
    tiled_by_k = {}

    def tiled_adj_for(K: int):
        if K not in tiled_by_k:
            tiled_by_k[K] = Adjacency.from_csr(
                csr, plan="tiled", k_hint=K,
                # forward-only benching: skip the transpose plan
                # (halves plan memory + tunnel transfer on rmat20)
                plan_transpose=False,
                # sum-only sweep: the aligned max/min layout would be
                # dead weight on the device
                minmax_aligned=False,
            )
        return tiled_by_k[K]

    for method in methods:
        if method in ("tiled", "tiled-hilo", "tiled-fast"):
            # Precision-tier pseudo-methods share the tiled plans; the
            # suffix maps to spmm(mode=...) — the sweep records the
            # speed/accuracy frontier (hilo halves the MXU passes at
            # ~1e-5 relative; the f64 golden validation column keeps the
            # claim honest per cell).
            adjs[method] = None  # resolved per K below
        elif method == "pallas":
            adjs[method] = Adjacency.from_csr(
                csr, plan="perrow",
                rows_per_block=rows_per_block, chunk_nnz=chunk_nnz,
            )
        else:
            adjs[method] = base_adj
    bcoo = None
    if "bcoo" in methods:
        from gespmm_tpu.ops.interop import csr_to_bcoo

        bcoo = csr_to_bcoo(csr)
    rng = np.random.default_rng(seed)
    results = {}

    def is_oom(e: Exception) -> bool:
        s = str(e)
        return "RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s

    def mem_mb() -> float:
        try:
            st = jax.devices()[0].memory_stats() or {}
            return st.get("bytes_in_use", 0) / 1e6
        except Exception:
            return float("nan")

    def progress(msg: str) -> None:
        print(f"[bench {name}] {msg} (dev {mem_mb():.0f} MB)",
              file=sys.stderr, flush=True)

    _A64 = [None]

    def _golden_mat():
        if _A64[0] is None:
            import scipy.sparse as sp

            _A64[0] = sp.csr_matrix(
                (
                    np.ones(csr.nnz, np.float64)
                    if csr.data is None
                    else np.asarray(csr.data).astype(np.float64),
                    np.asarray(csr.indices),
                    np.asarray(csr.indptr),
                ),
                shape=csr.shape,
            )
        return _A64[0]

    def release_device_memory():
        # Drop dead executables AND their pinned closure constants; a
        # failed width leaves per-K plan arrays + compiled programs
        # resident, which is exactly what starves the retry (the round-3
        # rmat18/rmat20 fatal: the handler's B re-alloc OOM'd against
        # the garbage of the failed K=512 attempt).
        import gc

        tiled_by_k.clear()
        gc.collect()
        jax.clear_caches()
        # Tunneled PJRT runtimes process deallocations asynchronously;
        # a tiny round-trip computation fences the free queue so the
        # next allocation sees the reclaimed space.
        try:
            float(jnp.zeros((8,)).sum())
        except Exception:
            pass

    def alloc_B(K):
        # OOM-halving allocation, ≙ the reference's max_ncols halving
        # loop (`spmm_test.cu:619-634`); used for BOTH the initial
        # allocation and the in-retry re-allocation so an OOM here can
        # never escape the sweep.
        while True:
            try:
                b = jnp.asarray(
                    rng.standard_normal((n, K)).astype(np.float32)
                )
                jax.block_until_ready(b)
                return b, K
            except Exception as e:
                if not is_oom(e) or K == 1:
                    raise
                release_device_memory()
                K //= 2

    def make_golden(Bcur):
        # Opt-in golden check, ≙ `#define VALIDATE` + the CPU triple
        # loop at `spmm_test.cu:595-604,671-698`.  float64 golden +
        # mixed abs/rel tolerance: f32 accumulation of a degree-d row
        # carries ~eps*sqrt(d)*|row| of inherent order noise, so a
        # pure absolute tolerance misflags every high-degree row.
        if not validate:
            return None
        return _golden_mat() @ np.asarray(Bcur).astype(np.float64)

    for K_req in ks:
        progress(f"K={K_req}: allocating B")
        try:
            B0, K0 = alloc_B(K_req)
            golden0 = make_golden(B0)
        except Exception as e:  # pragma: no cover
            for method in methods:
                results[(K_req, method)] = {"error": str(e)[:200]}
            release_device_memory()
            continue
        for method in methods:
          # Width is PER CELL: one method's OOM fallback must not shrink
          # the widths later methods are measured at.
          K, B, golden = K0, B0, golden0
          if method == "bcoo":
              # Predictive cap: the stock BCOO matmul materializes an
              # (nnz, K) contribution stream; run the widest power-of-2
              # fraction whose stream fits, instead of letting a 13GB+
              # attempt fatally fragment the device.  ≙ the merge-spmm
              # max_ncols ladder in `run_test.sh:12-16`.
              while csr.nnz * K * 4 > (6 << 30) and K > 1:
                  K //= 2
              if K != K0:
                  progress(f"K={K_req} bcoo: pre-capped to width {K}")
                  B = jnp.asarray(
                      rng.standard_normal((n, K)).astype(np.float32)
                  )
                  golden = make_golden(B)
          # One retry absorbs transient remote-compile failures (the
          # tunneled compile service occasionally 500s).  OOM halves K and
          # retries without consuming the attempt; when attempts run out
          # the (K_req, method) cell is always recorded as an error rather
          # than silently vanishing from the CSV.
          attempts = 2
          while True:
            try:
                progress(f"K={K_req} method={method} (width {K})")
                # Large graphs pass the adjacency as a jit ARGUMENT:
                # inlining plan arrays as literals makes 100MB+ compile
                # payloads that the remote compile service rejects.
                # Small graphs close over it: argument marshalling and
                # un-folded per-iteration plan reshapes cost more than
                # the kernel there (measured: cora K=128 86 -> 7 GF/s
                # when passed as an argument).
                big = csr.nnz > 4_000_000
                base_method, _, _mode = method.partition("-")
                _mode = _mode or "trilo"
                adj_m = (
                    adjs[method] if adjs[method] is not None
                    else tiled_adj_for(K)
                )
                if method == "bcoo":
                    fn = jax.jit(lambda b: bcoo @ b)
                elif big:
                    fn_a = jax.jit(
                        lambda a, b, _m=base_method, _md=_mode: spmm(
                            a, b, method=_m, mode=_md)
                    )
                    fn = lambda b, _f=fn_a, _a=adj_m: _f(_a, b)
                else:
                    fn = jax.jit(
                        lambda b, _a=adj_m, _m=base_method,
                        _md=_mode: spmm(_a, b, method=_m, mode=_md)
                    )
                if golden is not None:
                    got = np.asarray(fn(B)).astype(np.float64)
                    gold_cell = golden
                    if _mode == "fast":
                        # The fast tier's contract is "exact sum of
                        # bf16-rounded contributions": validate against
                        # the f64 golden of bf16-rounded inputs (vs the
                        # raw-f32 golden it is ~4e-2 in the quantization
                        # tail by construction, not by kernel error).
                        Bq = np.asarray(
                            jnp.asarray(B).astype(jnp.bfloat16)
                        ).astype(np.float64)
                        gold_cell = _golden_mat() @ Bq
                    err = float(
                        (np.abs(got - gold_cell)
                         / (1.0 + np.abs(gold_cell))).max()
                    )
                    if err > tol:
                        results[(K_req, method)] = {
                            "error": f"VALIDATION FAILED: err={err:.2e}"
                        }
                        break
                if m == n:
                    # Square: chain data-dependent steps inside one jit
                    # (pure device steady-state, no dispatch overhead).
                    if method == "bcoo":
                        r = timing.benchmark_chained(
                            lambda x: (bcoo @ x) * 0.5, B * 0.01,
                            iters=max(10, min(iters // 4, 50)), groups=4,
                        )
                    elif big:
                        r = timing.benchmark_chained(
                            lambda a, x, _m=base_method, _md=_mode: spmm(
                                a, x, method=_m, mode=_md) * 0.5,
                            B * 0.01,
                            iters=max(10, min(iters // 4, 50)), groups=4,
                            consts=adj_m,
                        )
                    else:
                        r = timing.benchmark_chained(
                            lambda x, _a=adj_m, _m=base_method,
                            _md=_mode: spmm(_a, x, method=_m,
                                            mode=_md) * 0.5,
                            B * 0.01,
                            iters=max(10, min(iters // 4, 50)), groups=4,
                        )
                    t = r.median_s
                else:
                    r = timing.benchmark(lambda: fn(B), iters=iters)
                    t = r.median_s
                gf = timing.spmm_flops(csr.nnz, K) / t / 1e9
                cell = {
                    "ms": t * 1e3,
                    "gflops": gf,
                    "nnz_per_s": csr.nnz / t,
                    **({"k_fallback": K} if K != K_req else {}),
                }
                if base_method == "tiled":
                    from gespmm_tpu.kernels.spmm_stream import (
                        stream_plan_stats,
                    )

                    it = 2 if _mode == "fast" else 4
                    slots, n_slabs = stream_plan_stats(adj_m.plan, K, it)
                    cell.update(slots=slots, n_slabs=n_slabs,
                                stream_item=it)
                results[(K_req, method)] = cell
                break
            except Exception as e:  # pragma: no cover
                fn = adj_m = None
                if K != K0:
                    B = golden = None
                release_device_memory()
                if is_oom(e) and K > 1:
                    progress(f"K={K_req} method={method}: OOM at width "
                             f"{K}, halving")
                    try:
                        B, K = alloc_B(K // 2)
                        golden = make_golden(B)
                    except Exception as e2:
                        results[(K_req, method)] = {"error": str(e2)[:200]}
                        break
                    continue
                attempts -= 1
                if attempts > 0:
                    continue
                results[(K_req, method)] = {"error": str(e)[:200]}
                break
        # Per-K plan layouts (k_hint-sized gather tables) are useless to
        # the next K; keep the sweep's resident set to one width.
        tiled_by_k.clear()
        B0 = golden0 = None

    row = {"data": name, "m": m, "n": n, "nnz": csr.nnz}
    for (K, method), v in results.items():
        row[f"K={K}-{method}-gflops"] = round(v.get("gflops", float("nan")), 2)
        if "k_fallback" in v:
            # An OOM-halved cell ran at a NARROWER width (≙ the
            # reference's max_ncols ladder) — record it next to the
            # number so the column is never silently mislabeled.
            row[f"K={K}-{method}-width"] = v["k_fallback"]
    if csv_file:
        _append_csv(csv_file, row)
    return row, results


def bench_sddmm_graph(
    name: str,
    ks: List[int],
    iters: int = 200,
    methods=("xla", "tiled"),
    csv_file: Optional[str] = None,
    seed: int = 0,
    validate: bool = False,
    tol: float = 2e-3,
):
    """SDDMM tier sweep: out[e] = D1[row_e]·D2[col_e] over the graph's
    pattern, timed per (K, tier) with float64 golden validation.

    The reference exposes SDDMM as a first-class op
    (`pytorch-custom/sddmm.cpp:63-68`, kernels `sddmm.cu:427-484`) but
    never benchmarks it; BASELINE.json names SDDMM at K=64 as a headline
    config, so this sweep records the measured tier table the dispatch
    heuristic in ops/sddmm.py is derived from.
    """
    import jax
    import jax.numpy as jnp

    from gespmm_tpu.ops.sddmm import sddmm
    from gespmm_tpu.ops.spmm import Adjacency
    from gespmm_tpu.utils import timing
    from gespmm_tpu.utils.datasets import (
        find_graph, load_mtx_graph, synth_graph,
    )

    if find_graph(name):
        csr = load_mtx_graph(name, binary=True)
    else:
        csr = synth_graph(name, seed=seed)
        if csr is None:
            raise FileNotFoundError(name)
    m, n = csr.shape
    adj = Adjacency.from_csr(csr, plan=True)
    rng = np.random.default_rng(seed)
    rows_h = np.repeat(np.arange(m), np.diff(np.asarray(csr.indptr)))
    cols_h = np.asarray(csr.indices)
    results = {}
    for K in ks:
        D1 = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32))
        D2 = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
        golden = None
        if validate:
            golden = np.einsum(
                "ek,ek->e",
                np.asarray(D1).astype(np.float64)[rows_h],
                np.asarray(D2).astype(np.float64)[cols_h],
            )
        for method in methods:
          for attempt in range(2):
            try:
                fn = jax.jit(
                    lambda a, b, _m=method: sddmm(adj, a, b, method=_m)
                )
                if golden is not None:
                    got = np.asarray(fn(D1, D2)).astype(np.float64)
                    err = float(
                        (np.abs(got - golden) / (1.0 + np.abs(golden))).max()
                    )
                    if err > tol:
                        results[(K, method)] = {
                            "error": f"VALIDATION FAILED: err={err:.2e}"
                        }
                        break
                # Chained steady-state (round 5): the dispatch-per-call
                # harness is RTT-dominated on tunneled runtimes (same
                # fix the SpMM sweep shipped in round 2) — chain data-
                # dependent iterations inside one jit.
                r = timing.benchmark_chained(
                    lambda d, _m=method: d + jnp.sum(
                        sddmm(adj, d, D2, method=_m)) * 1e-30,
                    D1, iters=max(10, min(iters // 4, 50)), groups=4,
                )
                t = r.median_s
                results[(K, method)] = {
                    "ms": t * 1e3,
                    "gflops": timing.spmm_flops(csr.nnz, K) / t / 1e9,
                }
                break
            except Exception as e:  # pragma: no cover
                if attempt == 0:
                    continue
                results[(K, method)] = {"error": str(e)[:200]}

    row = {"data": name, "m": m, "n": n, "nnz": csr.nnz}
    for (K, method), v in results.items():
        row[f"K={K}-sddmm-{method}-gflops"] = round(
            v.get("gflops", float("nan")), 2
        )
    if csv_file:
        _append_csv(csv_file, row)
    return row, results


def main(argv=None):
    # Under a TPU-registering sitecustomize, env vars alone cannot force
    # the CPU backend; pin it via jax.config BEFORE any backend query.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--graphs", nargs="+", default=["pubmed"])
    p.add_argument("--k", nargs="+", type=int, default=[32, 64, 128, 256])
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--methods", nargs="+",
               default=["xla", "tiled", "bcoo"],
               help="tiers: xla | tiled | tiled-hilo | tiled-fast | pallas | scatter | bcoo")
    p.add_argument("--csv", default="spmm_bench_out.csv")
    p.add_argument("--rows-per-block", type=int, default=64)
    p.add_argument("--chunk-nnz", type=int, default=64)
    p.add_argument("--validate", action="store_true",
                   help="golden-check each config vs scipy before timing")
    p.add_argument("--tol", type=float, default=2e-3,
               help="max |out-golden64|/(1+|golden64|); f32 accumulation noise on high-degree hub rows reaches ~5e-4 for any implementation (reference validates at 1e-2)")
    p.add_argument("--sddmm", action="store_true",
                   help="benchmark SDDMM tiers (xla/tiled) instead "
                        "of SpMM")
    p.add_argument("--roofline", action="store_true",
                   help="append K=<k>-roofline-frac columns (fraction of "
                        "the gather-SpMM speed of light, best tier)")
    args = p.parse_args(argv)

    for g in args.graphs:
        # Compiled executables pin their closure constants in HBM; a
        # multi-graph sweep accumulates them until device_put fails.
        import jax

        jax.clear_caches()
        try:
            _bench_one(g, args)
        except Exception as e:  # pragma: no cover
            import traceback

            traceback.print_exc(file=sys.stderr)
            print(json.dumps({"data": g, "errors": {"fatal": str(e)[:300]}}),
                  file=sys.stderr)
    return


def _bench_one(g, args):
    if True:
        if args.sddmm:
            row, results = bench_sddmm_graph(
                g, args.k, iters=args.iters,
                methods=tuple(
                    m for m in args.methods if m in ("xla", "tiled")
                ) or ("xla", "tiled"),
                csv_file=args.csv, validate=args.validate, tol=args.tol,
            )
        else:
            row, results = bench_graph(
                g, args.k, iters=args.iters, methods=tuple(args.methods),
                rows_per_block=args.rows_per_block, chunk_nnz=args.chunk_nnz,
                csv_file=None if args.roofline else args.csv,
                validate=args.validate, tol=args.tol,
            )
            if args.roofline:
                from gespmm_tpu.utils.profiling import (
                    spmm_roofline, spmm_stream_roofline,
                )

                for K in args.k:
                    best = min(
                        (v["ms"] for (kk, _), v in results.items()
                         if kk == K and "ms" in v),
                        default=None,
                    )
                    if best is None:
                        continue
                    rf = spmm_roofline(
                        row["nnz"], row["m"], K, best * 1e-3
                    )["fraction_of_roofline"]
                    row[f"K={K}-roofline-frac"] = round(rf, 3)
                    # Implementation-bound frac: best TILED cell vs the
                    # two-phase stream algorithm's own speed of light
                    # (the gap to the ideal column = fusion headroom).
                    tiled_cells = [
                        v for (kk, meth), v in results.items()
                        if kk == K and "slots" in v
                        and v.get("k_fallback", K) == K
                    ]
                    if tiled_cells:
                        bt = min(tiled_cells, key=lambda v: v["ms"])
                        sf = spmm_stream_roofline(
                            row["nnz"], row["m"], K, bt["ms"] * 1e-3,
                            slots=bt["slots"], n_slabs=bt["n_slabs"],
                            stream_item=bt["stream_item"],
                        )["fraction_of_roofline"]
                        row[f"K={K}-stream-roofline-frac"] = round(sf, 3)
                if args.csv:
                    _append_csv(args.csv, row)
        print(json.dumps(row))
        errs = {
            f"K={k}-{m}": v["error"]
            for (k, m), v in results.items()
            if "error" in v
        }
        if errs:
            print(
                json.dumps({"data": g, "errors": errs}), file=sys.stderr
            )


if __name__ == "__main__":
    main()
