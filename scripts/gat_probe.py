#!/usr/bin/env python
"""Decompose the GAT epoch cost on pubmed (round-2: find the 30ms)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gespmm_tpu.models.gat import GAT, gat_layer_apply
from gespmm_tpu.ops.graph import add_self_loops, edge_softmax
from gespmm_tpu.ops.sddmm import sddmm
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import planetoid_style_dataset

ds = planetoid_style_dataset("pubmed")
csr = add_self_loops(ds.csr)
adj = Adjacency.from_csr(csr, plan=True)
n = csr.shape[0]
nnz = csr.nnz
H = 64
rng = np.random.default_rng(0)
h = jnp.asarray(rng.standard_normal((n, H)).astype(np.float32) * 0.1)
logits = jnp.asarray(rng.standard_normal((nnz,)).astype(np.float32))
alpha0 = jnp.asarray(rng.random((nnz,)).astype(np.float32))
src = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
ones = jnp.ones((n,), jnp.float32)


def t(name, fn, x, iters=30):
    r = timing.benchmark_chained(fn, x, iters=iters, groups=4)
    print(f"{name:40s} {r.median_s*1e3:8.3f} ms", flush=True)
    return r.median_s


# pieces (chained on h-like carriers)
t("sddmm rank2 fwd", lambda x: x + sddmm(
    adj, jnp.stack([x[:, 0], ones], 1), jnp.stack([ones, x[:, 1]], 1)
)[:1].sum() * 0, h)
t("edge_softmax fwd", lambda x: x + edge_softmax(
    adj, logits + x[0, 0] * 0)[:1].sum() * 0, h)


def es_grad(x):
    g = jax.grad(lambda l: jnp.sum(jnp.sin(edge_softmax(adj, l))))(
        logits + x[0, 0] * 0
    )
    return x + g[:1].sum() * 0

t("edge_softmax fwd+bwd", es_grad, h)

t("spmm(alpha) fwd", lambda x: x + spmm(
    adj.with_data(alpha0 + x[0, 0] * 0), x, reduce="sum")[:1, :1].sum() * 0, h)


def spmm_alpha_grad(x):
    g = jax.grad(
        lambda a, xx: jnp.sum(jnp.sin(spmm(adj.with_data(a), xx))),
        argnums=(0, 1),
    )(alpha0 + x[0, 0] * 0, x)
    return x + g[0][:1].sum() * 0

t("spmm(alpha) fwd+bwd (grads a+x)", spmm_alpha_grad, h)

params = {
    "w": jnp.asarray(rng.standard_normal((H, H)).astype(np.float32) * 0.1),
    "a_src": jnp.asarray(rng.standard_normal((H,)).astype(np.float32)),
    "a_dst": jnp.asarray(rng.standard_normal((H,)).astype(np.float32)),
    "b": jnp.zeros((H,), jnp.float32),
}
t("gat layer fwd", lambda x: gat_layer_apply(params, adj, x), h)


def layer_grad(x):
    g = jax.grad(
        lambda p, xx: jnp.sum(jnp.sin(gat_layer_apply(p, adj, xx)))
    )(params, x)
    return x + g["w"][:1, :1].sum() * 0

t("gat layer fwd+bwd", layer_grad, h)
