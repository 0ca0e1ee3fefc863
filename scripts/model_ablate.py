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

if which == "gcnfull":
    # Replicate the exact gcn_bench train step (dropout + adamw + nll)
    # and time it with per-call dispatch, vs the bench's grouped timing.
    import optax

    from gespmm_tpu.models.gcn import GCN
    from gespmm_tpu.train.loop import TrainState, make_train_step

    ds2 = ds
    model = GCN(dims=[128, 32, 3], dropout_rate=0.5).with_norms(adj)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-2, weight_decay=5e-4)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, opt, adj=adj,
                           base_key=jax.random.PRNGKey(1))
    labels = jnp.asarray(ds2.labels)
    mask = jnp.asarray(ds2.masks["train"])
    x = jnp.asarray(ds2.features)
    state, _ = step(state, x, labels, mask)

    def run_once():
        nonlocal_state = step(state, x, labels, mask)
        return nonlocal_state[1]

    r = timing.benchmark(lambda: step(state, x, labels, mask)[1], iters=40)
    print(f"{'full train step (benchmark)':42s} {r.median_s*1e3:8.2f} ms",
          flush=True)
    # grouped manual timing like the loop does
    import time as _t
    from gespmm_tpu.utils.timing import _fence, measure_rtt

    st = state
    st, l = step(st, x, labels, mask)
    rtt = measure_rtt(l)
    t1 = _t.perf_counter()
    N = 60
    for _ in range(N):
        st, l = step(st, x, labels, mask)
    _fence(l)
    dt = (_t.perf_counter() - t1 - rtt) / N
    print(f"{'full train step (grouped x60)':42s} {dt*1e3:8.2f} ms",
          flush=True)
    print("DONE", flush=True)
