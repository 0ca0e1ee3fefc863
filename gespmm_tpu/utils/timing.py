"""Benchmark timing utilities.

TPU-correct counterpart of the reference's cudaEvent loops
(`spmm_test.cu:714-762`): warmup compile + `block_until_ready` fencing,
median-of-runs, and the same throughput definitions —
GFLOPs = 2·nnz·K / time (`spmm_test.cu:728`) plus nnz/s.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax


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


def benchmark(
    fn: Callable[[], jax.Array],
    iters: int = 200,
    warmup: int = 3,
) -> BenchResult:
    """Time a device computation. `fn` must return a jax array (fenced).

    200 timed iterations matches the reference's ITER (`spmm_test.cu:714`).
    """
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    times = []
    # Batch iterations between fences to avoid the dispatch-latency floor
    # (large on remote/tunneled devices), but keep several fenced groups
    # for a median.
    per_group = max(20, iters // 10)
    groups = max(3, iters // per_group)
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(per_group):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / per_group)
    times.sort()
    return BenchResult(
        mean_s=sum(times) / len(times),
        median_s=times[len(times) // 2],
        best_s=times[0],
        iters=groups * per_group,
    )


def spmm_flops(nnz: int, k: int) -> float:
    """2·nnz·K — the reference's FLOP definition (`spmm_test.cu:728`)."""
    return 2.0 * nnz * k


def sddmm_flops(nnz: int, k: int) -> float:
    return 2.0 * nnz * k
