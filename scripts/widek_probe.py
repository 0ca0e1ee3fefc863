"""Probe: wide-K (K=512) decomposition of the tiled stream SpMM.

Round-3 sweep: rmat16 K=512 at 0.145 of roofline while rmat14 hits
0.408.  Mechanisms under test (all on a live chip):

  1. Gather-table size: per-slot take cost vs the table bytes
     (col_rows x slab_K x 4).  Measured: 1.84 ns/slot at 32MB, 2.87 at
     64MB, 15.6 at 128MB — wide K with a plan whose col_tile was sized
     for K=128 silently quadruples the table.
  2. The one-hot scatter's MXU cost is ~3 passes x R x kt MACs per slot
     — linear in rows_per_block.  The auto planner floors R at 256 on
     single-tile plans where the density only needs ~16.

The chained step feeds the FULL output back into the next iteration
(0.5x + 0.5out), so XLA cannot dead-code-eliminate any K slab (an
earlier version fed back one scalar and measured a single slab).

Run:  python scripts/widek_probe.py [rmat16] [512]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gespmm_tpu.kernels.spmm_stream import spmm_tiled
from gespmm_tpu.sparse.partition import build_tiled_plan
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import rmat_graph

graph = sys.argv[1] if len(sys.argv) > 1 else "rmat16"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
scale = int(graph.removeprefix("rmat"))
csr = rmat_graph(scale=scale, edge_factor=16, seed=0)
m, n = csr.shape
assert m == n
rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32) * 0.01)
flops = 2.0 * csr.nnz * K

for R in (None, 128, 64, 32, 16):
    plan = build_tiled_plan(csr, rows_per_block=R)
    p0 = plan.parts[0]
    S = sum(p.num_slots for p in plan.parts)
    pad = S / csr.nnz - 1

    for k_slab in (128, 256):
        if K % k_slab:
            continue

        def step(x, _ks=k_slab, _plan=plan):
            outs = [
                spmm_tiled(_plan, None, x[:, k0 : k0 + _ks], m)
                for k0 in range(0, K, _ks)
            ]
            o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)
            return 0.5 * x + 0.5 * o  # full data dependence — no DCE

        r = timing.benchmark_chained(step, B, iters=8, groups=3)
        print(
            f"R={p0.rows_per_block:4d} E={p0.chunk_nnz} pad={pad:.3f} "
            f"k_slab={k_slab}: {r.median_s*1e3:7.2f} ms = "
            f"{flops / r.median_s / 1e9:6.1f} GF/s",
            flush=True,
        )

# K=128 regression check at the same R values.
B128 = B[:, :128]
for R in (None, 64, 32, 16):
    plan = build_tiled_plan(csr, rows_per_block=R)
    p0 = plan.parts[0]

    def step(x, _plan=plan):
        return 0.5 * x + 0.5 * spmm_tiled(_plan, None, x, m)

    r = timing.benchmark_chained(step, B128, iters=16, groups=3)
    print(
        f"K=128 R={p0.rows_per_block:4d}: {r.median_s*1e3:7.2f} ms = "
        f"{2.0 * csr.nnz * 128 / r.median_s / 1e9:6.1f} GF/s",
        flush=True,
    )
