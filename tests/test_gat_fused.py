"""Fused slot-space GAT attention vs the composed single-device chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.kernels.gat_fused import gat_attention_aggregate
from gespmm_tpu.ops.graph import additive_attention_logits, edge_softmax
from gespmm_tpu.ops.spmm import Adjacency, spmm
from tests.conftest import powerlaw_csr, random_csr

TOL = dict(rtol=1e-4, atol=1e-4)


def _composed(adj, src, dst, B, slope=0.2):
    logits = additive_attention_logits(adj, src, dst)
    alpha = edge_softmax(adj, jax.nn.leaky_relu(logits, slope))
    return spmm(adj.with_data(alpha), B, method="xla")


def _mk(m, n, K, density=0.12, seed=0, **plan_kw):
    csr, mat = random_csr(m, n, density=density, seed=seed)
    adj = Adjacency.from_csr(csr, plan=True, **plan_kw)
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.standard_normal((m,)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
    return adj, src, dst, B


@pytest.mark.parametrize(
    "shape,K,kw",
    [
        ((60, 50), 16, dict(col_tile=16, rows_per_block=8, chunk_nnz=8,
                            part_rows=24)),   # many tiles, many parts
        ((64, 64), 32, dict(col_tile=1 << 20, rows_per_block=16,
                            chunk_nnz=16)),   # single tile
    ],
)
def test_fused_matches_composed_chain(shape, K, kw):
    adj, src, dst, B = _mk(*shape, K, seed=shape[0], **kw)
    out = gat_attention_aggregate(adj, src, dst, B)
    expect = _composed(adj, src, dst, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), **TOL)


def test_fused_powerlaw_hub_rows():
    csr, _ = powerlaw_csr(96, 96, avg_deg=8, seed=3)
    adj = Adjacency.from_csr(csr, plan=True, col_tile=32, rows_per_block=8,
                             chunk_nnz=8, part_rows=40)
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((96,)).astype(np.float32))
    dst = jnp.asarray(rng.standard_normal((96,)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((96, 8)).astype(np.float32))
    out = gat_attention_aggregate(adj, src, dst, B)
    expect = _composed(adj, src, dst, B)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), **TOL)
    # Rows with no edges aggregate to zero.
    deg = np.diff(np.asarray(csr.indptr))
    assert np.all(np.abs(np.asarray(out)[deg == 0]) < 1e-6)


def test_fused_grads_match_composed():
    adj, src, dst, B = _mk(48, 48, 8, seed=9, col_tile=16,
                           rows_per_block=8, chunk_nnz=8, part_rows=24)
    w = jnp.asarray(
        np.random.default_rng(9).standard_normal((48, 8)).astype(np.float32)
    )

    def loss_fused(src, dst, B):
        return jnp.sum(gat_attention_aggregate(adj, src, dst, B) * w)

    def loss_comp(src, dst, B):
        return jnp.sum(_composed(adj, src, dst, B) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(src, dst, B)
    gc = jax.grad(loss_comp, argnums=(0, 1, 2))(src, dst, B)
    for a, b, name in zip(gf, gc, ["src", "dst", "B"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad_{name}",
        )


def test_fused_jit_and_dtype():
    adj, src, dst, B = _mk(40, 40, 8, seed=5, col_tile=1 << 20,
                           rows_per_block=8, chunk_nnz=8)
    f = jax.jit(lambda s, d, b: gat_attention_aggregate(adj, s, d, b))
    o1 = f(src, dst, B)
    o2 = f(src, dst, B)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    ob = gat_attention_aggregate(adj, src, dst, B.astype(jnp.bfloat16))
    assert ob.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(ob.astype(jnp.float32)).all())


def test_fused_validates_inputs():
    adj, src, dst, B = _mk(40, 40, 8, seed=5, col_tile=1 << 20,
                           rows_per_block=8, chunk_nnz=8)
    with pytest.raises(ValueError, match="single head"):
        gat_attention_aggregate(adj, src[:10], dst, B)
    with pytest.raises(ValueError, match="must be"):
        gat_attention_aggregate(adj, src, dst, B[:10])
    from gespmm_tpu.ops.spmm import Adjacency as A

    adj_np = A.from_csr(adj.csr)  # no plan
    with pytest.raises(ValueError, match="plan"):
        gat_attention_aggregate(adj_np, src, dst, B)
