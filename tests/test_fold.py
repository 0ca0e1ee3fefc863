"""Folded stream layout (round 5): F consecutive chunks' slots
interleave so the reduce kernel's DMA rows are F*K wide (the transfer is
descriptor-bound at narrow K on TPU — sparse/partition._fold_factor).

On CPU the fold defaults to 1, so these tests pin F explicitly and check
that every consumer of the physical slot order stays correct: the sum
kernel, the minmax scan kernel, multi-K-tile strided fallback, SDDMM's
inverse map, the minmax VJP, and gradients end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.kernels.spmm_stream import sddmm_tiled, spmm_tiled
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.sparse.partition import build_tiled_plan
from tests.conftest import powerlaw_csr, random_csr

TOL = dict(rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("F", [2, 4])
@pytest.mark.parametrize("multi_tile", [False, True])
def test_folded_sum_matches_scipy(F, multi_tile):
    csr, mat = random_csr(96, 80, density=0.12, seed=41)
    kw = {"col_tile": 16, "rows_per_block": 16, "chunk_nnz": 8,
          "part_rows": 48} if multi_tile else {}
    plan = build_tiled_plan(csr, fold=F, minmax_aligned=False, **kw)
    assert all(p.fold == F for p in plan.parts)
    B = np.random.default_rng(41).standard_normal((80, 12)).astype(np.float32)
    out = spmm_tiled(plan, csr.data, jnp.asarray(B), 96, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, **TOL)


@pytest.mark.parametrize("F", [4])
def test_folded_multi_k_tile_strided_fallback(F):
    # K_pad > kt forces the strided folded-column selection inside
    # _reduce_part (n_k > 1).
    from gespmm_tpu.kernels.spmm_stream import _gather_part, _reduce_part

    csr, mat = random_csr(64, 48, density=0.15, seed=42)
    plan = build_tiled_plan(csr, fold=F, minmax_aligned=False)
    part = plan.parts[0]
    K = 256
    B = np.random.default_rng(42).standard_normal((48, K)).astype(np.float32)
    contrib = _gather_part(part, csr.data, jnp.asarray(B))
    out = _reduce_part(
        contrib, part.local_rows, part.row_start, part.m_pad,
        part.rows_per_block, 128, "trilo", True, op="sum", fold=F,
    )
    np.testing.assert_allclose(
        np.asarray(out)[:64], mat @ B, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("op", ["max", "min"])
def test_folded_minmax_scan(op):
    # The scan kernel over a folded plan (minmax_aligned off): per-chunk
    # slices come from the folded block; runs/ties must survive.
    csr, mat = powerlaw_csr(96, 80, avg_deg=8, seed=43)
    plan = build_tiled_plan(csr, fold=4, minmax_aligned=False)
    B = np.random.default_rng(43).standard_normal((80, 8)).astype(np.float32)
    out = np.asarray(spmm_tiled(
        plan, csr.data, jnp.asarray(B), 96, interpret=True, reduce=op
    ))
    dense = np.asarray(mat.toarray())
    red = np.max if op == "max" else np.min
    exp = np.zeros((96, 8), np.float32)
    for r in range(96):
        cols = mat.indices[mat.indptr[r] : mat.indptr[r + 1]]
        vals = mat.data[mat.indptr[r] : mat.indptr[r + 1]]
        if len(cols):
            exp[r] = red(vals[:, None] * B[cols], axis=0)
    np.testing.assert_allclose(out, exp, rtol=1e-6, atol=1e-6)


def test_folded_sddmm_inverse_map():
    csr, mat = random_csr(80, 70, density=0.1, seed=44)
    plan = build_tiled_plan(csr, fold=4, minmax_aligned=False)
    rng = np.random.default_rng(44)
    D1 = jnp.asarray(rng.standard_normal((80, 16)).astype(np.float32))
    D2 = jnp.asarray(rng.standard_normal((70, 16)).astype(np.float32))
    out = np.asarray(sddmm_tiled(plan, D1, D2))
    rows = np.repeat(np.arange(80), np.diff(mat.indptr))
    exp = np.einsum("ek,ek->e", np.asarray(D1)[rows],
                    np.asarray(D2)[mat.indices])
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_folded_grads_end_to_end():
    # spmm through Adjacency with folded plans: sum grads (B + edge
    # values) and minmax VJP (scan path, folded phase streams).
    import dataclasses

    csr, mat = random_csr(72, 60, density=0.12, seed=45)
    adj = Adjacency.from_csr(csr, plan=True, fold=4, minmax_aligned=False)
    adj_plain = Adjacency.from_csr(csr)
    rng = np.random.default_rng(45)
    B = jnp.asarray(
        (np.round(rng.standard_normal((60, 12)) * 2) / 2).astype(np.float32)
    )
    for reduce in ("sum", "max"):
        def loss(b, a, meth, _r=reduce):
            return jnp.sum(jnp.sin(spmm(a, b, reduce=_r, method=meth)))
        g_t = jax.grad(lambda b: loss(b, adj, "tiled"))(B)
        g_x = jax.grad(lambda b: loss(b, adj_plain, "xla"))(B)
        np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_x),
                                   rtol=1e-4, atol=1e-4)
        ge_t = jax.grad(
            lambda v: loss(B, adj.with_data(v), "tiled"))(csr.data)
        ge_x = jax.grad(
            lambda v: loss(B, adj_plain.with_data(v), "xla"))(csr.data)
        np.testing.assert_allclose(np.asarray(ge_t), np.asarray(ge_x),
                                   rtol=1e-4, atol=1e-4)
