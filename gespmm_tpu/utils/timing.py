"""Benchmark timing utilities.

TPU-correct counterpart of the reference's cudaEvent loops
(`spmm_test.cu:714-762`): warmup compile, fenced timing, median-of-groups,
and the same throughput definitions — GFLOPs = 2·nnz·K / time
(`spmm_test.cu:728`) plus nnz/s.

Methodology note (important on remote/tunneled TPU runtimes): on some
platforms `jax.block_until_ready` returns before device execution finishes,
while any device->host transfer drains the execution queue (one RTT, which
can be tens of ms through a tunnel).  We therefore time *groups* of
dispatches followed by a tiny scalar fetch — the device executes the queue
FIFO, so the fetch fences the whole group — and subtract a separately
measured fetch-only round-trip baseline.  Per-iteration time is
(group_time - rtt) / group_size, reported as min/median/mean over groups.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BenchResult:
    mean_s: float
    median_s: float
    best_s: float
    iters: int

    def gflops(self, flops: float) -> float:
        return flops / self.mean_s / 1e9

    def rate(self, count: float) -> float:
        return count / self.mean_s


def _fence(out) -> float:
    """Drain the device queue: fetch one scalar from the output pytree."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))[0])


def measure_rtt(out, reps: int = 3) -> float:
    """Fetch-only round trip for an already-computed output (baseline)."""
    _fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def benchmark(
    fn: Callable[[], jax.Array],
    iters: int = 200,
    warmup: int = 3,
) -> BenchResult:
    """Time a device computation with queue-fenced groups.

    200 timed iterations matches the reference's ITER (`spmm_test.cu:714`).
    `fn` must return a jax array (or pytree of arrays).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    rtt = measure_rtt(out)

    per_group = max(10, iters // 10)
    groups = max(4, iters // per_group)
    # Scale the group so its work dwarfs fetch-RTT jitter.
    t0 = time.perf_counter()
    for _ in range(per_group):
        out = fn()
    _fence(out)
    est = max(time.perf_counter() - t0 - rtt, 1e-6)
    if est < 0.3:
        per_group = min(per_group * (int(0.3 / est) + 1), 5000)
    times = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(per_group):
            out = fn()
        _fence(out)
        dt = time.perf_counter() - t0 - rtt
        times.append(max(dt, 1e-9) / per_group)
    times.sort()
    return BenchResult(
        mean_s=sum(times) / len(times),
        median_s=times[len(times) // 2],
        best_s=times[0],
        iters=groups * per_group,
    )


def benchmark_chained(
    step: Callable[..., jax.Array],
    x0: jax.Array,
    iters: int = 50,
    groups: int = 4,
    consts=None,
) -> BenchResult:
    """Pure device steady-state: `iters` data-chained steps inside ONE jit.

    Eliminates per-dispatch overhead entirely (the analogue of the
    reference timing only kernel execution with cudaEvents,
    `spmm_test.cu:730-760`).  `step` must map an array to an array of the
    same shape/dtype; successive applications are data-dependent so the
    compiler cannot elide or overlap them.

    ``consts``: optional pytree passed as ``step(consts, x)`` and
    threaded as a jit ARGUMENT.  Closure arrays are inlined into the
    compiled program as literals — for multi-million-edge tile plans
    that makes 100MB+ MLIR payloads that the remote compile service
    rejects (and compiles take minutes); passing them as arguments keeps
    the program small.
    """

    if consts is None:
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, iters, lambda i, v: step(v), x)
    else:
        @jax.jit
        def chain_c(c, x):
            return jax.lax.fori_loop(0, iters, lambda i, v: step(c, v), x)

        def chain(x):
            return chain_c(consts, x)

    out = chain(x0)
    rtt = measure_rtt(out)
    # Size each fenced group so its device work dwarfs the fetch-RTT
    # jitter (tens of ms through a tunnel): estimate one chain call, then
    # run enough calls per group to hit ~0.4s of work.
    t0 = time.perf_counter()
    out = chain(x0)
    _fence(out)
    est = max(time.perf_counter() - t0 - rtt, 1e-6)
    calls = max(1, min(int(0.4 / est) + 1, max(100000 // iters, 1)))
    times = []
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = chain(x0)
        _fence(out)
        times.append(
            max(time.perf_counter() - t0 - rtt, 1e-9) / (iters * calls)
        )
    times.sort()
    return BenchResult(
        mean_s=sum(times) / len(times),
        median_s=times[len(times) // 2],
        best_s=times[0],
        iters=groups * iters * calls,
    )


def spmm_flops(nnz: int, k: int) -> float:
    """2·nnz·K — the reference's FLOP definition (`spmm_test.cu:728`)."""
    return 2.0 * nnz * k


def sddmm_flops(nnz: int, k: int) -> float:
    return 2.0 * nnz * k
