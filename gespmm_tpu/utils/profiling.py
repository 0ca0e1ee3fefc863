"""Profiling and roofline analysis.

Counterparts of the reference's two tracing mechanisms (SURVEY §5.1):
cudaEvent timing loops -> `utils.timing.benchmark`; torch profiler tables ->
`trace()` (jax.profiler, view in TensorBoard/XProf) plus `op_cost_table`
(XLA's own HLO cost analysis — the closest thing to a per-kernel table
without a viewer).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: `with trace('/tmp/trace'): step()`."""
    with jax.profiler.trace(log_dir):
        yield


def op_cost_table(fn: Callable, *args) -> Dict[str, float]:
    """Compile `fn(*args)` and return XLA's cost analysis.

    Keys include 'flops', 'bytes accessed', 'transcendentals', etc.
    """
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        (analysis,) = [compiled.cost_analysis()] if isinstance(
            compiled.cost_analysis(), dict
        ) else [compiled.cost_analysis()[0]]
    except (TypeError, IndexError):
        analysis = compiled.cost_analysis()
    return dict(analysis) if analysis else {}


def spmm_roofline(
    nnz: int, m: int, k: int, measured_s: float, hbm_gbps: float = 795.0,
    gather_ns_per_row: float = 2.2,
) -> Dict[str, float]:
    """Roofline for gather-SpMM on TPU.

    Two bounds apply (docs/PERF.md): the bandwidth bound (gathered B rows
    + indices + output at `hbm_gbps`) and the measured VMEM-tiled gather
    bound (`gather_ns_per_row`, ~2.2ns/slot on v5e; 10ns if the dense
    operand cannot be tiled into VMEM-sized tables).  Speed of light is
    the max of the two.  Pass measured values for honest %-of-roofline
    reporting (BASELINE.md targets >=70%).
    """
    bytes_moved = nnz * k * 4 + nnz * 8 + m * k * 4
    sol_s = max(
        bytes_moved / (hbm_gbps * 1e9), nnz * gather_ns_per_row * 1e-9
    )
    flops = 2.0 * nnz * k
    return {
        "bytes_moved": float(bytes_moved),
        "speed_of_light_s": sol_s,
        "achieved_gflops": flops / measured_s / 1e9,
        "sol_gflops": flops / sol_s / 1e9,
        "fraction_of_roofline": sol_s / measured_s,
    }


def spmm_stream_roofline(
    nnz: int, m: int, k: int, measured_s: float,
    slots: int, n_slabs: int = 1, stream_item: int = 4,
    hbm_gbps: float = 795.0, gather_ns_per_row: float = 2.2,
    stream_read_ns_per_slot: float = 2.4,
) -> Dict[str, float]:
    """Roofline of the IMPLEMENTED two-phase stream algorithm (vs the
    ideal one-pass bound of `spmm_roofline`).

    The gather phase reads B rows AND materializes the contribution
    stream to HBM; the Pallas reduce re-reads it.  So the algorithm
    moves ≈ nnz·k (B read) + 2·slots·k·(item/4) (stream write+read)
    f32-equivalents plus the output, and pays the per-slot gather issue
    cost once per K-slab.  Round 5: the kernel's stream-read block
    transfer is additionally DESCRIPTOR-bound below K≈512 — a copy-only
    kernel measures ~2.4 ns/slot at K ≤ 128 regardless of chunk
    geometry (docs/PERF.md "the narrow-K stream floor") — so the bound
    takes that issue floor per slab pass too.  `fraction` against THIS
    bound isolates kernel inefficiency from the structural cost of the
    two-phase design; the gap between the two bounds is the fusion
    headroom (docs/PERF.md).
    """
    bytes_moved = (
        nnz * k * 4                      # B rows through the gather
        + 2 * slots * k * stream_item    # stream write + kernel read
        + m * k * 4                      # output
        + slots * 8 * n_slabs            # slot indices per slab pass
    )
    # The read-issue floor fades once a slot's stream bytes exceed the
    # descriptor cost's bandwidth-equivalent (~K>=512 at f32).
    read_issue_s = slots * n_slabs * max(
        stream_read_ns_per_slot * 1e-9
        - (k * stream_item) / (hbm_gbps * 1e9),
        0.0,
    ) + bytes_moved / (hbm_gbps * 1e9)
    sol_s = max(
        read_issue_s,
        slots * n_slabs * gather_ns_per_row * 1e-9,
    )
    flops = 2.0 * nnz * k
    return {
        "bytes_moved": float(bytes_moved),
        "speed_of_light_s": sol_s,
        "achieved_gflops": flops / measured_s / 1e9,
        "sol_gflops": flops / sol_s / 1e9,
        "fraction_of_roofline": sol_s / measured_s,
    }


def measure_hbm_bandwidth(size_mb: int = 256) -> float:
    """Measured device stream bandwidth (GB/s) via a chained elementwise
    pass (queue-fenced; see utils/timing.py for why block_until_ready
    timing is wrong on tunneled runtimes).  v5e measures ~795 GB/s."""
    import jax.numpy as jnp

    from gespmm_tpu.utils import timing

    rows = size_mb * (1 << 20) // (4 * 1024)
    x = jnp.ones((rows, 1024), jnp.float32)
    r = timing.benchmark_chained(
        lambda v: v * 1.0000001, x, iters=20, groups=3
    )
    # One read + one write per element per step.
    return 2 * rows * 1024 * 4 / r.best_s / 1e9
