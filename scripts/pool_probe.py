#!/usr/bin/env python
"""SAGE-pool cost decomposition on pubmed (dims [128, 16, 3]).

Locates where the 4.0 ms pool epoch goes (VERDICT r2 #5: pool target
<=2.5 ms) before optimizing: times the max-reduce SpMM forward and
forward+backward at each layer's K against the sum-reduce equivalents
and the full train step.  Markdown table for
bench_results/pool_profile.md.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from gespmm_tpu.ops.graph import add_self_loops
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import planetoid_style_dataset

ds = planetoid_style_dataset("pubmed")
csr = add_self_loops(ds.csr)
adj = Adjacency.from_csr(csr, plan=True)
n = csr.shape[0]
rng = np.random.default_rng(0)

rows = []


def bench(label, step, x0):
    r = timing.benchmark_chained(step, x0, iters=20, groups=3)
    rows.append((label, r.median_s * 1e3))
    print(f"| {label} | {r.median_s * 1e3:.3f} |", flush=True)


print("# SAGE-pool cost decomposition — pubmed, dims [128,16,3] (round 5)")
print()
print("| component | ms |")
print("|---|---|")

for K in (128, 16):
    x = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))

    def fwd_sum(v):
        return spmm(adj, v, reduce="sum")[:, :K] * 0.999 + v * 1e-6

    def fwd_max(v):
        return spmm(adj, v, reduce="max")[:, :K] * 0.999 + v * 1e-6

    def fb_sum(v):
        loss, g = jax.value_and_grad(
            lambda u: jnp.sum(spmm(adj, u, reduce="sum") ** 2)
        )(v)
        return g * 1e-6 + v * 0.999

    def fb_max(v):
        loss, g = jax.value_and_grad(
            lambda u: jnp.sum(spmm(adj, u, reduce="max") ** 2)
        )(v)
        return g * 1e-6 + v * 0.999

    bench(f"spmm sum fwd K={K}", fwd_sum, x)
    bench(f"spmm max fwd K={K}", fwd_max, x)
    bench(f"spmm sum fwd+bwd K={K}", fb_sum, x)
    bench(f"spmm max fwd+bwd K={K}", fb_max, x)

# Full train steps for context (mirrors sage_bench wiring).
from gespmm_tpu.models.sage import GraphSAGE
import optax

for aggr in ("mean", "pool"):
    model = GraphSAGE(dims=[128, 16, 3], aggregator=aggr, dropout_rate=0.0)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    feats = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=(n,)))
    mask = jnp.asarray(np.ones((n,), np.float32))

    def loss_fn(p):
        lp = model.log_probs(p, adj, feats)
        per = -jnp.take_along_axis(lp, labels[:, None], axis=1)[:, 0]
        return jnp.sum(per * mask) / jnp.sum(mask)

    def step(carry, _x):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, up)
        return (p, s), _x + loss * 1e-9

    # chain train steps by hand: carry params through fori_loop
    import functools

    @jax.jit
    def chain(p, s, v):
        def body(i, carry):
            (p, s), v = carry
            return step((p, s), v)

        return jax.lax.fori_loop(0, 20, body, ((p, s), v))

    out = chain(params, opt_state, jnp.zeros(()))
    jax.block_until_ready(out)
    import time

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = chain(params, opt_state, jnp.zeros(()))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / (20 * 5))
    rows.append((f"{aggr} train step", best * 1e3))
    print(f"| {aggr} train step (chained) | {best * 1e3:.3f} |", flush=True)

print()
print("Timing: utils/timing.benchmark_chained (queue-fenced, "
      "RTT-subtracted, data-chained iterations in one jit).")
print("""
Canonical epoch number: bench_results/sage_pool_epoch.json (the
train loop the A/B uses); the chained-step row above carries its own
fori_loop harness overhead.

## Round-5: the scan-free row-aligned layout landed

Round 4 located the floor in the max-reduce SpMM: the in-kernel
segmented scan paid ceil(log2(hub degree)) = 8 full-stream shift passes
at BOTH feature widths (~0.72 ms per max forward).  Round 5 replaced it
for single-table graphs with the row-aligned layout
(`sparse/partition.AlignedMinmaxPlan`): degree-class reshape-reduce
fused with the gather, inverse-permutation scatter, hierarchical tie
counts — kernel-free forward — plus a one-gather aligned VJP over the
transpose layout (`spmm_minmax_vjp_aligned`).  Measured on pubmed: max
fwd 0.72 -> 0.39 ms at K in {16, 128} (exact vs float64), fwd+bwd
1.71 -> 1.23 (K=128) and 1.52 -> 1.07 (K=16); the pool epoch met the
<= 2.5 ms target.  Multi-tile-scale graphs keep the scan kernel (the
aligned layout needs the whole-operand table in the fast gather tier).
""")
