#!/usr/bin/env python
"""Round-3 GAT cost decomposition on pubmed (hidden=64, single head).

Times the FUSED slot-space attention chain (kernels/gat_fused) against
round 2's composed chain and the plain tiled SpMM floor, forward and
train-step, with queue-fenced chained timing.  Output is a markdown
table for bench_results/gat_profile.md (VERDICT r2 #4: "profile it
before optimizing — record the table in bench_results").
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gespmm_tpu.kernels.gat_fused import gat_attention_aggregate
from gespmm_tpu.models.gat import GAT
from gespmm_tpu.ops.graph import (
    add_self_loops,
    additive_attention_logits,
    edge_softmax,
)
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import planetoid_style_dataset

ds = planetoid_style_dataset("pubmed")
csr = add_self_loops(ds.csr)
adj = Adjacency.from_csr(csr, plan=True)
n = csr.shape[0]
H = 64
rng = np.random.default_rng(0)
h0 = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32) * 0.1)
a_src = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
a_dst = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
w = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32))

rows = []


def t(name, step, x, iters=30):
    r = timing.benchmark_chained(step, x, iters=iters, groups=4,
                                 consts=adj)
    rows.append((name, r.median_s * 1e3))
    print(f"| {name} | {r.median_s*1e3:.3f} |", flush=True)
    return r.median_s


print("# GAT cost decomposition — pubmed, hidden 64, single head (round 3)")
print()
print("| component | ms |")
print("|---|---|")

# Floor: one tiled SpMM at K=64.
t("spmm_tiled K=64 (floor)",
  lambda a, x: spmm(a, x, method="tiled") * 0.5 + x * 0.5, h0)

# Fused attention, forward.
t("fused attention fwd",
  lambda a, x: gat_attention_aggregate(a, x @ a_src, x @ a_dst, x) * 0.5
  + x * 0.5, h0)

# Fused attention, forward + backward.
def _fused_loss(a, x):
    return jnp.sum(gat_attention_aggregate(a, x @ a_src, x @ a_dst, x) * w)

t("fused attention fwd+bwd",
  lambda a, x: x - 1e-4 * jax.grad(_fused_loss, argnums=1)(a, x), h0,
  iters=20)

# Round-2 composed chain, forward (for the delta).
def _composed(a, x):
    logits = additive_attention_logits(a, x @ a_src, x @ a_dst)
    alpha = edge_softmax(a, jax.nn.leaky_relu(logits, 0.2))
    return spmm(a.with_data(alpha), x, method="tiled")

t("composed chain fwd (round-2 path)",
  lambda a, x: _composed(a, x) * 0.5 + x * 0.5, h0)

def _composed_loss(a, x):
    return jnp.sum(_composed(a, x) * w)

t("composed chain fwd+bwd (round-2 path)",
  lambda a, x: x - 1e-4 * jax.grad(_composed_loss, argnums=1)(a, x), h0,
  iters=20)

# Full model epoch (2-layer GAT train step) — measured by gat_bench; a
# single fwd+bwd through the model here for cross-checking.
model = GAT(dims=[ds.features.shape[1], H, ds.num_classes],
            dropout_rate=0.0)
params = model.init(jax.random.PRNGKey(0))
labels = jnp.asarray(ds.labels)
mask = jnp.asarray(ds.masks["train"])
feats = jnp.asarray(ds.features)


def _model_loss(p):
    lp = model.log_probs(p, adj, feats)
    sel = jnp.where(mask, 1.0, 0.0)
    return -jnp.sum(jnp.take_along_axis(lp, labels[:, None], 1)[:, 0] * sel)


gfn = jax.jit(jax.grad(_model_loss))
g1 = gfn(params)  # warm
r = timing.benchmark(lambda: gfn(params), iters=30)
print(f"| model 2-layer fwd+bwd (jit) | {r.median_s*1e3:.3f} |")
print()
print("Timing: utils/timing.benchmark_chained (queue-fenced, RTT-"
      "subtracted, data-chained iterations in one jit).")
