"""Matrix Market ingest: reference-reader semantics vs scipy.io.mmread."""

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from gespmm_tpu.sparse import io as gio


def _write_and_read(tmp_path, row, col, val, shape, symmetry="general", **kw):
    path = str(tmp_path / "g.mtx")
    gio.write_mtx(path, row, col, val, shape, symmetry=symmetry)
    return path, gio.read_mtx(path, use_native=kw.pop("use_native", False), **kw)


def test_general_real_matches_scipy(tmp_path):
    rng = np.random.default_rng(0)
    m, n, nnz = 23, 31, 60
    row = rng.integers(0, m, nnz)
    col = rng.integers(0, n, nnz)
    # Dedup to keep the oracle simple (mmread sums duplicates, we don't for
    # general matrices — matching the reference reader).
    uniq = {}
    for r, c in zip(row, col):
        uniq[(int(r), int(c))] = rng.standard_normal()
    row = np.array([k[0] for k in uniq])
    col = np.array([k[1] for k in uniq])
    val = np.array(list(uniq.values()), np.float32)

    path, coo = _write_and_read(tmp_path, row, col, val, (m, n))
    oracle = sio.mmread(path).tocsr()
    got = sp.coo_matrix(
        (np.asarray(coo.data), (np.asarray(coo.row), np.asarray(coo.col))),
        shape=coo.shape,
    ).tocsr()
    assert (abs(oracle - got) > 1e-6).nnz == 0


def test_pattern_field(tmp_path):
    row = np.array([0, 1, 2, 2])
    col = np.array([1, 0, 0, 2])
    path = str(tmp_path / "p.mtx")
    gio.write_mtx(path, row, col, None, (3, 3))
    coo = gio.read_mtx(path, use_native=False)
    np.testing.assert_array_equal(np.asarray(coo.data), np.ones(4, np.float32))
    np.testing.assert_array_equal(np.asarray(coo.row), [0, 1, 2, 2])
    np.testing.assert_array_equal(np.asarray(coo.col), [1, 0, 0, 2])


def test_symmetric_mirrors_and_drops_self_loops(tmp_path):
    # Lower triangle + one self-loop; symmetric banner.
    row = np.array([1, 2, 2, 0])
    col = np.array([0, 0, 1, 0])  # (0,0) is a self-loop
    val = np.array([1.0, 2.0, 3.0, 9.0], np.float32)
    path, coo = _write_and_read(
        tmp_path, row, col, val, (3, 3), symmetry="symmetric"
    )
    got = np.asarray(coo.todense())
    expect = np.array(
        [[0, 1, 2], [1, 0, 3], [2, 3, 0]], np.float32
    )
    np.testing.assert_allclose(got, expect)


def test_symmetric_dedups(tmp_path):
    # Both (1,0) and (0,1) present; mirroring creates duplicates -> dedup
    # keeps the first occurrence (reference makeSymmetric behavior).
    row = np.array([1, 0])
    col = np.array([0, 1])
    val = np.array([5.0, 7.0], np.float32)
    path, coo = _write_and_read(
        tmp_path, row, col, val, (2, 2), symmetry="symmetric"
    )
    assert coo.nnz == 2
    dense = np.asarray(coo.todense())
    # Keep-first semantics (stable sort puts originals before mirrored
    # copies): each triangle keeps its ORIGINAL value — (0,1)=7, (1,0)=5 —
    # matching the reference's makeSymmetric compaction.
    np.testing.assert_allclose(dense, [[0, 7], [5, 0]])


def test_rowmajor_sorted(tmp_path):
    rng = np.random.default_rng(4)
    m = 15
    row = rng.integers(0, m, 40)
    col = rng.integers(0, m, 40)
    uniq = sorted({(int(r), int(c)) for r, c in zip(row, col)})
    row = np.array([u[0] for u in uniq])
    col = np.array([u[1] for u in uniq])
    val = rng.standard_normal(len(uniq)).astype(np.float32)
    # Shuffle before writing; reader must sort row-major.
    p = rng.permutation(len(uniq))
    path, coo = _write_and_read(tmp_path, row[p], col[p], val[p], (m, m))
    r, c = np.asarray(coo.row), np.asarray(coo.col)
    key = r.astype(np.int64) * m + c
    assert (np.diff(key) > 0).all()


def test_header_parse(tmp_path):
    path = str(tmp_path / "h.mtx")
    gio.write_mtx(path, [0], [1], [2.0], (4, 5))
    h = gio.read_mtx_header(path)
    assert (h.rows, h.cols, h.nnz) == (4, 5, 1)
    assert h.field == "real" and h.symmetry == "general"


def test_read_mtx_csr_binary(tmp_path):
    path = str(tmp_path / "b.mtx")
    gio.write_mtx(path, [0, 1], [1, 0], [3.0, 4.0], (2, 2))
    csr = gio.read_mtx_csr(path, binary=True, use_native=False)
    assert csr.data is None
    np.testing.assert_allclose(
        np.asarray(csr.todense()), [[0, 1], [1, 0]]
    )


def test_bad_banner_raises(tmp_path):
    path = str(tmp_path / "bad.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket tensor coordinate real general\n1 1 0\n")
    with pytest.raises(gio.MtxFormatError):
        gio.read_mtx(path, use_native=False)
