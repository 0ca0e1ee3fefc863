"""Format containers, conversions, transpose pairing — vs scipy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from gespmm_tpu.sparse.formats import (
    COO,
    CSR,
    coo_from_dense,
    csr_from_coo,
    csr_from_scipy,
    csr_to_csc,
    expand_indptr,
    in_degrees,
    indptr_from_rows,
    out_degrees,
    transpose,
)
from tests.conftest import random_csr


def test_expand_indptr_roundtrip():
    indptr = jnp.asarray([0, 2, 2, 5, 5, 5, 9], jnp.int32)
    rows = expand_indptr(indptr, 9)
    np.testing.assert_array_equal(
        np.asarray(rows), [0, 0, 2, 2, 2, 5, 5, 5, 5]
    )
    back = indptr_from_rows(rows, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(indptr))


def test_expand_indptr_trailing_empty_rows():
    indptr = jnp.asarray([0, 3, 3, 3], jnp.int32)
    rows = expand_indptr(indptr, 3)
    np.testing.assert_array_equal(np.asarray(rows), [0, 0, 0])


def test_csr_from_coo_matches_scipy():
    ours, mat = random_csr(37, 23, density=0.2, seed=3)
    coo = ours.to_coo()
    rebuilt = csr_from_coo(coo)
    np.testing.assert_array_equal(np.asarray(rebuilt.indptr), mat.indptr)
    np.testing.assert_array_equal(np.asarray(rebuilt.indices), mat.indices)
    np.testing.assert_allclose(np.asarray(rebuilt.data), mat.data, rtol=1e-6)


def test_todense_matches_scipy():
    ours, mat = random_csr(17, 29, density=0.15, seed=7)
    np.testing.assert_allclose(
        np.asarray(ours.todense()), mat.toarray(), rtol=1e-6
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_csr_to_csc_matches_scipy(seed):
    ours, mat = random_csr(31, 44, density=0.1, seed=seed)
    csc, perm = csr_to_csc(ours, return_permutation=True)
    oracle = mat.tocsc()
    oracle.sort_indices()
    np.testing.assert_array_equal(np.asarray(csc.indptr), oracle.indptr)
    np.testing.assert_array_equal(np.asarray(csc.indices), oracle.indices)
    np.testing.assert_allclose(np.asarray(csc.data), oracle.data, rtol=1e-6)
    # Permutation semantics: csc.data == csr.data[perm]
    np.testing.assert_allclose(
        np.asarray(ours.data)[np.asarray(perm)], np.asarray(csc.data)
    )


def test_transpose_matches_scipy():
    ours, mat = random_csr(19, 26, density=0.2, seed=11)
    t = transpose(ours)
    oracle = mat.T.tocsr()
    oracle.sort_indices()
    assert t.shape == (26, 19)
    np.testing.assert_array_equal(np.asarray(t.indptr), oracle.indptr)
    np.testing.assert_array_equal(np.asarray(t.indices), oracle.indices)
    np.testing.assert_allclose(np.asarray(t.data), oracle.data, rtol=1e-6)


def test_degrees():
    ours, mat = random_csr(21, 34, density=0.2, seed=5)
    np.testing.assert_array_equal(
        np.asarray(out_degrees(ours)), np.diff(mat.indptr)
    )
    np.testing.assert_array_equal(
        np.asarray(in_degrees(ours)),
        np.asarray((mat != 0).sum(axis=0)).ravel(),
    )


def test_binary_csr_pytree_roundtrip():
    import jax

    ours, _ = random_csr(10, 10, density=0.3, seed=9, binary=True)
    assert ours.data is None
    leaves, treedef = jax.tree_util.tree_flatten(ours)
    assert len(leaves) == 2
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.data is None and back.shape == ours.shape


def test_coo_from_dense_roundtrip():
    rng = np.random.default_rng(2)
    dense = rng.standard_normal((9, 13)) * (rng.random((9, 13)) < 0.3)
    coo = coo_from_dense(dense)
    np.testing.assert_allclose(np.asarray(coo.todense()), dense, rtol=1e-6)
