"""Graph reordering: permutation validity + spmm consistency + locality."""

import jax.numpy as jnp
import numpy as np
import pytest

from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.sparse.reorder import (
    apply_permutation,
    bandwidth_stats,
    inverse_permutation,
    reorder,
)
from gespmm_tpu.utils.datasets import sbm_graph
from tests.conftest import random_csr


@pytest.mark.parametrize("method", ["rcm", "degree", "bfs"])
def test_reorder_is_valid_permutation(method):
    csr, _ = random_csr(60, 60, density=0.08, seed=1)
    rcsr, perm = reorder(csr, method)
    assert sorted(perm.tolist()) == list(range(60))
    assert rcsr.nnz == csr.nnz


@pytest.mark.parametrize("method", ["rcm", "degree", "bfs"])
def test_reordered_spmm_consistent(method):
    csr, mat = random_csr(50, 50, density=0.1, seed=2)
    rcsr, perm = reorder(csr, method)
    B = np.random.default_rng(2).standard_normal((50, 8)).astype(np.float32)
    out_orig = np.asarray(spmm(Adjacency.from_csr(csr), jnp.asarray(B)))
    out_perm = np.asarray(
        spmm(Adjacency.from_csr(rcsr), jnp.asarray(B[perm]))
    )
    np.testing.assert_allclose(out_perm, out_orig[perm], rtol=1e-5, atol=1e-5)
    # And back via the inverse permutation.
    inv = inverse_permutation(perm)
    np.testing.assert_allclose(out_perm[inv], out_orig, rtol=1e-5, atol=1e-5)


def test_rcm_improves_locality_on_community_graph():
    ds = sbm_graph(n_per_class=100, num_classes=4, p_in=0.08, p_out=0.002, seed=3)
    # Shuffle first so there is locality to recover.
    rng = np.random.default_rng(3)
    shuf = rng.permutation(400)
    shuffled = apply_permutation(ds.csr, shuf)
    before = bandwidth_stats(shuffled)
    rcsr, _ = reorder(shuffled, "rcm")
    after = bandwidth_stats(rcsr)
    assert after["block_span_mean"] < before["block_span_mean"]


def test_bfs_covers_disconnected_components():
    import scipy.sparse as sp

    from gespmm_tpu.sparse.formats import csr_from_scipy

    blocks = sp.block_diag(
        [sp.random(20, 20, 0.2, random_state=1) for _ in range(3)]
    ).tocsr()
    blocks.sort_indices()
    csr = csr_from_scipy(blocks.astype(np.float32))
    _, perm = reorder(csr, "bfs")
    assert sorted(perm.tolist()) == list(range(60))
