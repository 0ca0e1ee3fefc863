#!/usr/bin/env python
"""Decompose the multi-tile (rmat18) stream-SpMM cost on the real chip:
gather vs concat vs reduce vs full op, and sweep R / col_tile.
Round-2 probe for closing the rmat18/rmat20 gap (VERDICT item 2)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gespmm_tpu.kernels import spmm_stream as ss
from gespmm_tpu.sparse.partition import build_tiled_plan
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import rmat_graph

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 18
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128

csr = rmat_graph(scale=SCALE, edge_factor=16, seed=0)
m, n = csr.shape
nnz = csr.nnz
flops = 2.0 * nnz * K
B = jnp.asarray(
    (np.random.default_rng(0).standard_normal((n, K)) * 0.01).astype(np.float32)
)


def report(name, t, work_flops=flops):
    print(f"{name:34s} {t*1e3:9.2f} ms  {work_flops/t/1e9:7.1f} GF/s",
          flush=True)


def bench(fn, x, iters=8):
    r = timing.benchmark_chained(fn, x, iters=iters, groups=3)
    return r.median_s


for col_tile, rpb in ((None, None), (16384, 128), (16384, 256),
                      (32768, 256), (8192, 256), (16384, 512)):
    kw = {}
    if col_tile:
        kw = dict(col_tile=col_tile, rows_per_block=rpb)
    plan = build_tiled_plan(csr, **kw)
    p0 = plan.parts[0]
    S = plan.num_slots
    nparts = len(plan.parts)
    ntiles = sum(len(p.tile_slices) for p in plan.parts)
    label = f"ct={col_tile or 'auto'} R={plan.parts[0].rows_per_block}"
    print(f"--- {label}: parts={nparts} tiles={ntiles} slots={S} "
          f"pad={plan.padding_ratio:.3f}", flush=True)

    def full(x, plan=plan):
        return ss.spmm_tiled(plan, None, x, m) * 0.5

    t = bench(full, B)
    report(f"full spmm_tiled [{label}]", t)

    if col_tile is None:
        # decomposition at the default plan only
        # gather with full consumption (sum) to prevent DCE
        def gather_sum(x, plan=plan):
            acc = 0.0
            for part in plan.parts:
                g = ss._gather_part(part, None, x)
                acc = acc + jnp.sum(g, axis=0)
            return x + acc[None, :] * 0.5

        t = bench(gather_sum, B)
        report("gather+rowsum (no reduce kernel)", t)

        # reduce kernel only, on a pre-materialized stream
        contribs = [ss._gather_part(p, None, B) for p in plan.parts]
        contribs = [jax.device_put(c) for c in contribs]
        jax.block_until_ready(contribs)

        def reduce_only(c0):
            outs = []
            for part, c in zip(plan.parts, contribs):
                kt = min(512, max(128, c.shape[1]))
                kt = K if K <= 512 else 128
                outs.append(ss._reduce_part(
                    c if part is not plan.parts[0] else c0,
                    part.local_rows, part.row_start, part.m_pad,
                    part.rows_per_block, min(K, 512), "trilo", False,
                ))
            return c0 + outs[0][:1, :]

        t = bench(reduce_only, contribs[0])
        report("reduce kernel only", t)

        # hilo / fast modes
        for mode in ("hilo", "fast"):
            def fm(x, plan=plan, mode=mode):
                return ss.spmm_tiled(plan, None, x, m, mode=mode) * 0.5
            t = bench(fm, B)
            report(f"full mode={mode}", t)

# XLA baseline
from gespmm_tpu.ops import reference as ref
from gespmm_tpu.sparse.formats import expand_indptr

rows = expand_indptr(csr.indptr, nnz)
def xla(x):
    return ref.spmm_rows_xla(rows, csr.indices, None, x, m) * 0.5
t = bench(xla, B)
report("xla segment-sum", t)
