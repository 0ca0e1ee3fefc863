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


def test_fennel_partition_balanced_and_cuts_community_graph():
    from gespmm_tpu.sparse.reorder import fennel_partition

    ds = sbm_graph(n_per_class=100, num_classes=8, p_in=0.12, p_out=0.002,
                   seed=5)
    rng = np.random.default_rng(5)
    shuffled = apply_permutation(ds.csr, rng.permutation(800))
    P = 4
    labels = fennel_partition(shuffled, P, passes=3)
    sizes = np.bincount(labels, minlength=P)
    assert sizes.max() <= -(-800 // P)
    indptr = np.asarray(shuffled.indptr)
    indices = np.asarray(shuffled.indices)
    rows = np.repeat(np.arange(800), np.diff(indptr))
    cut = np.count_nonzero(labels[rows] != labels[indices]) / len(rows)
    naive = (np.arange(800) // 200).astype(np.int32)
    naive_cut = np.count_nonzero(naive[rows] != naive[indices]) / len(rows)
    # Fennel must find most of the community structure the shuffle hid.
    assert cut < 0.5 * naive_cut, (cut, naive_cut)


def test_partition_order_improves_halo_footprint():
    from gespmm_tpu.sparse.reorder import halo_need_stats, partition_order

    ds = sbm_graph(n_per_class=100, num_classes=8, p_in=0.12, p_out=0.002,
                   seed=6)
    rng = np.random.default_rng(6)
    shuffled = apply_permutation(ds.csr, rng.permutation(800))
    P = 4
    base = halo_need_stats(shuffled, P)
    perm = partition_order(shuffled, P, method="fennel")
    assert sorted(perm.tolist()) == list(range(800))
    part = halo_need_stats(apply_permutation(shuffled, perm), P)
    assert part["footprint_frac"] < 0.7 * base["footprint_frac"], (
        part["footprint_frac"], base["footprint_frac"])
    # auto must never lose to the identity order (it scores it as a
    # candidate).
    perm_auto = partition_order(shuffled, P, method="auto")
    auto = halo_need_stats(apply_permutation(shuffled, perm_auto), P)
    assert auto["footprint_frac"] <= base["footprint_frac"] + 1e-9


def test_partitioned_halo_spmm_matches_dense():
    # End-to-end: partition_order -> apply_permutation -> halo partition
    # -> sharded SpMM must equal the dense product in permuted order.
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P_

    from gespmm_tpu.parallel.halo import (
        build_halo_partition, halo_spmm, pad_for_halo,
    )
    from gespmm_tpu.parallel.mesh import make_mesh
    from gespmm_tpu.sparse.reorder import partition_order

    ds = sbm_graph(n_per_class=64, num_classes=8, p_in=0.15, p_out=0.004,
                   seed=7)
    rng = np.random.default_rng(7)
    csr = apply_permutation(ds.csr, rng.permutation(512))
    n = 512
    nd = 4
    perm = partition_order(csr, nd, method="fennel")
    pcsr = apply_permutation(csr, perm)
    hp = build_halo_partition(pcsr, nd, tiled=False)
    mesh = make_mesh(data=nd, model=1, devices=jax.devices()[:nd])
    B = rng.standard_normal((n, 16)).astype(np.float32)
    Bp = jnp.asarray(B[perm])
    Bd = jax.device_put(pad_for_halo(hp, Bp),
                        NamedSharding(mesh, P_("data", None)))
    out = jax.jit(lambda b: halo_spmm(hp, b, mesh, model_axis=None))(Bd)
    import scipy.sparse as sp
    dense = sp.csr_matrix(
        (np.ones(csr.nnz, np.float32), np.asarray(csr.indices),
         np.asarray(csr.indptr)), shape=csr.shape).toarray()
    expect = (dense @ B)[perm]
    np.testing.assert_allclose(np.asarray(out)[:n], expect, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.slow
def test_partition_order_rmat16_footprint_target():
    """VERDICT r2 #3 done-criterion: footprint_frac at P=8 on rmat16
    drops to <= 0.6 (needs the native Fennel path for speed)."""
    import gespmm_tpu.utils.native as nat

    if not nat.available():
        pytest.skip("native lib unavailable")
    from gespmm_tpu.sparse.reorder import (
        apply_permutation, halo_need_stats, partition_order,
    )
    from gespmm_tpu.utils.datasets import rmat_graph

    csr = rmat_graph(scale=16, edge_factor=16, seed=1)
    base = halo_need_stats(csr, 8)["footprint_frac"]
    perm = partition_order(csr, 8, method="auto")
    part = halo_need_stats(apply_permutation(csr, perm), 8)[
        "footprint_frac"
    ]
    assert part <= 0.6, (base, part)
    assert part < 0.75 * base, (base, part)
