"""BCOO interop + scatter-formulation baseline tier."""

import jax.numpy as jnp
import numpy as np

from gespmm_tpu.ops import reference as ref
from gespmm_tpu.ops.interop import bcoo_spmm_baseline, csr_from_bcoo, csr_to_bcoo
from gespmm_tpu.sparse.formats import expand_indptr
from tests.conftest import random_csr

TOL = dict(rtol=1e-5, atol=1e-5)


def test_bcoo_roundtrip():
    csr, mat = random_csr(23, 31, density=0.15, seed=0)
    bcoo = csr_to_bcoo(csr)
    back = csr_from_bcoo(bcoo)
    np.testing.assert_array_equal(np.asarray(back.indptr), mat.indptr)
    np.testing.assert_array_equal(np.asarray(back.indices), mat.indices)
    np.testing.assert_allclose(np.asarray(back.data), mat.data, rtol=1e-6)


def test_bcoo_baseline_matches_scipy():
    csr, mat = random_csr(30, 28, density=0.12, seed=1)
    B = np.random.default_rng(1).standard_normal((28, 8)).astype(np.float32)
    out = bcoo_spmm_baseline(csr, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(out), mat @ B, rtol=1e-4, atol=1e-4)


def test_scatter_formulation_matches_gather():
    csr, mat = random_csr(40, 35, density=0.1, seed=2)
    B = np.random.default_rng(2).standard_normal((35, 12)).astype(np.float32)
    rows = expand_indptr(csr.indptr, csr.nnz)
    scatter = ref.spmm_scatter_xla(rows, csr.indices, csr.data, jnp.asarray(B), 40)
    gather = ref.spmm_xla(csr.indptr, csr.indices, csr.data, jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(scatter), np.asarray(gather), **TOL)
    np.testing.assert_allclose(np.asarray(gather), mat @ B, **TOL)
