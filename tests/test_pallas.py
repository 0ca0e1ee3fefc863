"""Pallas kernels vs the XLA reference ops — interpret mode on CPU.

(Compiled-mode equivalence on real TPU hardware is exercised by bench.py
and the verify flow; interpret mode checks the kernel logic itself.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.kernels.spmm_pallas import spmm_pallas
from gespmm_tpu.sparse.partition import build_spmm_plan
from tests.conftest import powerlaw_csr, random_csr

TOL = dict(rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,density", [((50, 40), 0.15), ((100, 90), 0.05)])
def test_spmm_pallas_interpret(shape, density):
    csr, mat = random_csr(*shape, density=density, seed=1)
    plan = build_spmm_plan(csr, rows_per_block=8, chunk_nnz=16)
    B = np.random.default_rng(1).standard_normal((shape[1], 32)).astype(np.float32)
    out = spmm_pallas(plan, csr.data, jnp.asarray(B), shape[0], k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, **TOL)


def test_spmm_pallas_binary_interpret():
    csr, mat = random_csr(40, 40, density=0.1, seed=2, binary=True)
    plan = build_spmm_plan(csr, rows_per_block=8, chunk_nnz=16)
    B = np.random.default_rng(2).standard_normal((40, 16)).astype(np.float32)
    out = spmm_pallas(plan, None, jnp.asarray(B), 40, k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, **TOL)


def test_spmm_pallas_powerlaw_megarows():
    # Skewed rows spanning many chunks of the same block.
    csr, mat = powerlaw_csr(64, 48, avg_deg=10, seed=3)
    plan = build_spmm_plan(csr, rows_per_block=8, chunk_nnz=8)
    B = np.random.default_rng(3).standard_normal((48, 8)).astype(np.float32)
    out = spmm_pallas(plan, csr.data, jnp.asarray(B), 64, k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, rtol=1e-4, atol=1e-4)


def test_spmm_pallas_k_tiling():
    # K larger than one k_tile exercises the second grid dimension.
    csr, mat = random_csr(30, 25, density=0.2, seed=4)
    plan = build_spmm_plan(csr, rows_per_block=8, chunk_nnz=16)
    B = np.random.default_rng(4).standard_normal((25, 300)).astype(np.float32)
    out = spmm_pallas(plan, csr.data, jnp.asarray(B), 30, k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, **TOL)




def test_plan_padding_and_shapes():
    csr, mat = random_csr(30, 30, density=0.1, seed=8)
    plan = build_spmm_plan(csr, rows_per_block=8, chunk_nnz=16)
    assert plan.cols.shape == plan.local_rows.shape == plan.src.shape
    assert plan.block_ids.shape[0] == plan.num_chunks
    # Every chunk's first flag: exactly num_blocks ones.
    assert int(np.asarray(plan.first).sum()) == plan.num_blocks
    # Sentinel rows only on padded slots.
    lr = np.asarray(plan.local_rows)
    n_real = int((lr < plan.rows_per_block).sum())
    assert n_real == csr.nnz


# ---------------------------------------------------------------------------
# Grouped-gather kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("binary", [True, False])
def test_spmm_grouped_interpret(binary):
    from gespmm_tpu.kernels.spmm_grouped import spmm_grouped
    from gespmm_tpu.sparse.partition import build_grouped_plan

    csr, mat = random_csr(60, 50, density=0.12, seed=1, binary=binary)
    plan = build_grouped_plan(
        csr, rows_per_block=8, edges_per_chunk=16,
        groups_per_chunk=8, group_rows=8,
    )
    B = np.random.default_rng(1).standard_normal((50, 40)).astype(np.float32)
    out = spmm_grouped(plan, csr.data, jnp.asarray(B), 60, k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, rtol=1e-5, atol=1e-5)


def test_spmm_grouped_k_tiling_powerlaw():
    from gespmm_tpu.kernels.spmm_grouped import spmm_grouped
    from gespmm_tpu.sparse.partition import build_grouped_plan

    csr, mat = powerlaw_csr(80, 64, avg_deg=8, seed=2)
    plan = build_grouped_plan(
        csr, rows_per_block=8, edges_per_chunk=16,
        groups_per_chunk=8, group_rows=8,
    )
    B = np.random.default_rng(2).standard_normal((64, 300)).astype(np.float32)
    out = spmm_grouped(plan, csr.data, jnp.asarray(B), 80, k_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), mat @ B, rtol=1e-4, atol=1e-4)


def test_grouped_plan_invariants():
    from gespmm_tpu.sparse.partition import build_grouped_plan

    csr, _ = random_csr(40, 40, density=0.15, seed=3)
    plan = build_grouped_plan(
        csr, rows_per_block=8, edges_per_chunk=16,
        groups_per_chunk=4, group_rows=8,
    )
    lr = np.asarray(plan.local_rows)
    slots = np.asarray(plan.slots)
    groups = np.asarray(plan.groups)
    cols = np.asarray(csr.indices)
    src = np.asarray(plan.src)
    real = lr < plan.rows_per_block
    assert int(real.sum()) == csr.nnz
    # Every real edge's staged slot points at its own column.
    for c in range(plan.num_chunks):
        for e in range(plan.edges_per_chunk):
            if not real[c, e]:
                continue
            slot = slots[c, e]
            gid = groups[c, slot // plan.group_rows]
            col = gid * plan.group_rows + slot % plan.group_rows
            assert col == cols[src[c, e]]


def test_plan_kind_selection():
    from gespmm_tpu.ops.spmm import Adjacency
    from gespmm_tpu.sparse.partition import (
        GroupedSpmmPlan,
        SpmmPlan,
        TiledSpmmPlan,
    )

    csr, _ = random_csr(200, 200, density=0.01, seed=4)
    # auto/True -> tiled stream plan (measured fastest tier on v5e).
    adj = Adjacency.from_csr(
        csr, plan=True, rows_per_block=8, chunk_nnz=16, col_tile=64,
        part_rows=128,
    )
    assert isinstance(adj.plan, TiledSpmmPlan)
    # explicit kinds still honored
    adj_pr = Adjacency.from_csr(
        csr, plan="perrow", rows_per_block=8, chunk_nnz=16
    )
    assert isinstance(adj_pr.plan, SpmmPlan)
    adj_gr = Adjacency.from_csr(
        csr, plan="grouped", rows_per_block=8, edges_per_chunk=16,
        groups_per_chunk=16, group_rows=8,
    )
    assert isinstance(adj_gr.plan, GroupedSpmmPlan)
