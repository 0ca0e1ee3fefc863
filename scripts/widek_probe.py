"""Probe: wide-K (K=512) decomposition of the tiled stream SpMM.

rmat16 K=512 measured 0.145 of roofline in the round-3 sweep while
rmat14 K=512 hit 0.408.  rmat16's plan is single-tile (table = whole B),
so at K=512 (2 slabs of 256) each slab's gather table is 64MB; rmat14's
is 16384x512x4 = 32MB in ONE pass.  This probe times, per slab width:

  * gather-only (take from the full-width table slice)
  * the full spmm_tiled at that forced k_slab

to locate where the time goes and pick the k_slab policy.

Run on a live chip:  python scripts/widek_probe.py [rmat16] [512]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gespmm_tpu.kernels import spmm_stream
from gespmm_tpu.ops.spmm import Adjacency
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import rmat_graph

graph = sys.argv[1] if len(sys.argv) > 1 else "rmat16"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
scale = int(graph.removeprefix("rmat"))
csr = rmat_graph(scale=scale, edge_factor=16, seed=0)
m, n = csr.shape
adj = Adjacency.from_csr(csr, plan=True)
plan = adj.plan
part = plan.parts[0]
S = sum(p.num_slots for p in plan.parts)
print(f"{graph}: m={m} nnz={csr.nnz} slots={S} parts={len(plan.parts)} "
      f"col_tile={plan.col_tile} R={part.rows_per_block} E={part.chunk_nnz}",
      flush=True)

rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))

flops = 2.0 * csr.nnz * K

# 1. gather-only at each slab width (chained on a dummy dependency).
for k_slab in (128, 256, 512):
    if k_slab > K:
        continue
    Bs = B[:, :k_slab]

    def gather_step(x):
        # x: (1,1) f32 scalar-ish carrier; fold into the first element so
        # iterations stay data-dependent.
        out = None
        for p in plan.parts:
            g = spmm_stream._gather_part(p, None, Bs + x[0, 0])
            s = g[:1, :1]
            out = s if out is None else out + s
        return out

    r = timing.benchmark_chained(gather_step, jnp.zeros((1, 1)), iters=10,
                                 groups=3)
    per_row = r.median_s / S * 1e9
    tbl_mb = plan.col_tile * min(plan.col_tile, n) and (
        min(plan.col_tile, n) * k_slab * 4 / 2**20)
    print(f"gather-only k_slab={k_slab}: {r.median_s*1e3:.2f} ms "
          f"({per_row:.2f} ns/slot, table={tbl_mb:.0f}MB)", flush=True)

# 2. full spmm_tiled with forced slab width (monkeypatch the budget).
orig = spmm_stream.spmm_tiled
for stream_budget in (1 << 29, 1 << 30, 2 << 30, 8 << 30):
    # budget controls k_slab = budget // (slots*4), snapped to 128.
    item = 4
    slots_max = max(p.num_slots for p in plan.parts)
    if slots_max * item * K > stream_budget and K > 128:
        k_slab = max(128, (stream_budget // (slots_max * item) // 128) * 128)
    else:
        k_slab = K
    src = spmm_stream.spmm_tiled.__wrapped__ if hasattr(
        spmm_stream.spmm_tiled, "__wrapped__") else spmm_stream.spmm_tiled

    def step(x, _b=stream_budget):
        import gespmm_tpu.kernels.spmm_stream as ss
        old = None
        return ss.spmm_tiled(plan, None, x, m)

    # patch the constant via a small shim: call with sliced B per slab
    def step2(x, _ks=k_slab):
        outs = []
        for k0 in range(0, K, _ks):
            outs.append(orig(plan, None, x[:, k0:k0 + _ks], m))
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)
        # feed back same shape
        return jnp.concatenate([o[:, : B.shape[1]]], 1)[: n] if o.shape[0] >= n else x

    # simplest honest loop: chain via adding a scalar derived from out
    def step3(x, _ks=k_slab):
        outs = []
        for k0 in range(0, K, _ks):
            outs.append(orig(plan, None, x[:, k0:k0 + _ks], m))
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 1)
        return x + o[:1, :1] * 1e-30

    r = timing.benchmark_chained(step3, B, iters=8, groups=3)
    print(f"spmm k_slab={k_slab}: {r.median_s*1e3:.2f} ms "
          f"= {flops / r.median_s / 1e9:.1f} GF/s", flush=True)
