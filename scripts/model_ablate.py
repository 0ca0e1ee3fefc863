#!/usr/bin/env python
"""Ablate GCN / SAGE-pool / GAT epoch cost on pubmed: time train steps
with individual ops stubbed to localize the wall. Known-good harness
(train-loop style chained timing, adjacency closed over jit)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gespmm_tpu.models.common import dense_init
from gespmm_tpu.ops.graph import add_self_loops, degree_norm, edge_softmax
from gespmm_tpu.ops.sddmm import sddmm
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import planetoid_style_dataset

t0 = time.time()
ds = planetoid_style_dataset("pubmed")
csr = add_self_loops(ds.csr)
adj = Adjacency.from_csr(csr, plan=True)
n = csr.shape[0]
norms = degree_norm(adj)
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32) * 0.1)


def bench_step(name, loss_fn, params, iters=20):
    """Time value_and_grad of loss_fn via a param-chained loop."""
    def step(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 1e-6 * b, p, g)

    # chain on params (pytree) — benchmark via repeated calls
    f = jax.jit(step)
    r = timing.benchmark(lambda: f(params), iters=iters)
    print(f"{name:42s} {r.median_s*1e3:8.2f} ms  [t+{time.time()-t0:.0f}s]",
          flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "gcn"

if which == "gcn":
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {"l1": dense_init(k1, 128, 32), "l2": dense_init(k2, 32, 3)}
    out_n, in_n = norms

    def gcn_loss(p, method="auto", n_spmm=2):
        h = x0 @ p["l1"]["w"] + p["l1"]["b"]
        if n_spmm >= 1:
            h = h * in_n[:, None]
            h = spmm(adj, h, method=method)
            h = h * out_n[:, None]
        h = jax.nn.relu(h)
        h = h @ p["l2"]["w"] + p["l2"]["b"]
        if n_spmm >= 2:
            h = h * in_n[:, None]
            h = spmm(adj, h, method=method)
            h = h * out_n[:, None]
        return jnp.sum(jnp.sin(h))

    bench_step("gcn fwd+bwd (auto/tiled)", lambda p: gcn_loss(p), params)
    bench_step("gcn fwd+bwd (xla)",
               lambda p: gcn_loss(p, method="xla"), params)
    bench_step("gcn no spmm at all",
               lambda p: gcn_loss(p, n_spmm=0), params)
    bench_step("gcn one spmm (K=32)",
               lambda p: gcn_loss(p, n_spmm=1), params)
elif which == "gat":
    from gespmm_tpu.models.gat import gat_layer_init

    key = jax.random.PRNGKey(0)
    params = {"L": gat_layer_init(key, 128, 64)}

    def gat_loss(p, use_sddmm=True, use_soft=True, use_alpha=True):
        pr = p["L"]
        h = x0 @ pr["w"]
        if use_sddmm:
            src = h @ pr["a_src"]
            dst = h @ pr["a_dst"]
            ones = jnp.ones_like(src)
            logits = sddmm(adj, jnp.stack([src, ones], 1),
                           jnp.stack([ones, dst], 1))
            logits = jax.nn.leaky_relu(logits, 0.2)
        else:
            logits = jnp.ones((adj.nnz,), jnp.float32) * jnp.sum(pr["a_src"]) * 1e-6
        alpha = edge_softmax(adj, logits) if use_soft else logits
        out = (spmm(adj.with_data(alpha), h) if use_alpha
               else spmm(adj, h))
        return jnp.sum(jnp.sin(out + pr["b"]))

    bench_step("gat layer full", lambda p: gat_loss(p), params, iters=10)
    bench_step("gat no softmax", lambda p: gat_loss(p, use_soft=False),
               params, iters=10)
    bench_step("gat no sddmm", lambda p: gat_loss(p, use_sddmm=False),
               params, iters=10)
    bench_step("gat plain spmm (no alpha)",
               lambda p: gat_loss(p, use_soft=False, use_alpha=False),
               params, iters=10)
elif which == "pool":
    key = jax.random.PRNGKey(0)
    params = {"w": dense_init(key, 128, 16)}

    def pool_loss(p, reduce="max", method="auto"):
        h = jax.nn.relu(x0 @ p["w"]["w"] + p["w"]["b"])
        agg = spmm(adj, h, reduce=reduce, method=method)
        return jnp.sum(jnp.sin(agg))

    bench_step("pool max (tiled)", lambda p: pool_loss(p), params)
    bench_step("pool max (xla)",
               lambda p: pool_loss(p, method="xla"), params)
    bench_step("pool sum (control)",
               lambda p: pool_loss(p, reduce="sum"), params)
print("DONE", flush=True)
