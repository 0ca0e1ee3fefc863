#!/usr/bin/env python
"""Minimal repro of the TPU-worker fault in single-gather SpMM at 31M edges.

Observed (round 4, v5e, libtpu 2026-08): BOTH single-gather XLA SpMM
formulations — gather+segment_sum and gather+scatter-add — kill the TPU
WORKER PROCESS (not a Python exception) when the gather covers rmat20's
31.4M indices, reproducibly (3/3 runs, process-isolated; see
bench_results/spmm_sweep_errors.log).  rmat18 (7.6M edges) is healthy up
to K=512.  The stream kernel (`method="tiled"`) runs rmat20 fine — its
gathers are tile-local and its reduce is a Pallas kernel.

Because the fault takes down the whole client, the library guards these
tiers at XLA_SEGMENT_NNZ_LIMIT (`ops/reference.py`) — this script is the
checked-in evidence and the canary for future runtime fixes:

    # EXPECT: worker fault / crashed process, NOT a clean result
    GESPMM_UNSAFE_XLA_SEGMENT=1 python scripts/rmat20_fault_repro.py

    # EXPECT: ValueError from the guard, process survives
    python scripts/rmat20_fault_repro.py

If the unsafe invocation ever completes cleanly, the runtime fixed the
fault: re-measure the XLA/BCOO tiers at rmat20 and consider retiring the
guard.  Run ONLY in a process you can afford to lose (never inside a
shared bench loop without isolation).
"""
import os
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gespmm_tpu.utils.datasets import synth_graph
    from gespmm_tpu.ops.spmm import Adjacency, spmm

    K = int(os.environ.get("REPRO_K", "128"))
    scale = int(os.environ.get("REPRO_SCALE", "20"))
    print(f"backend={jax.default_backend()} scale={scale} K={K}", flush=True)
    csr = synth_graph(f"rmat{scale}")
    print(f"graph: {csr.shape} nnz={csr.nnz}", flush=True)
    adj = Adjacency.from_csr(csr)  # no plan: XLA tier
    B = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (csr.shape[1], K), np.float32
        )
    )
    try:
        out = spmm(adj, B, method="xla")
        out.block_until_ready()
    except ValueError as e:
        print(f"GUARDED (ValueError): {e}", flush=True)
        return 0
    # Unsafe mode reaching here means the worker survived the dispatch —
    # verify the values actually came back (a faulted worker hangs or
    # errors on fetch).
    s = float(jnp.sum(out[:8, :8]))
    print(f"COMPLETED CLEANLY: checksum {s:.4f} — runtime may be fixed;"
          " re-measure the XLA/BCOO tiers at this scale", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
