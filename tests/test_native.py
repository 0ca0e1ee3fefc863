"""Native C++ graph-IO vs the NumPy reference path (identical semantics)."""

import numpy as np
import pytest

from gespmm_tpu.sparse import io as gio
from gespmm_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _roundtrip(tmp_path, row, col, val, shape, symmetry="general"):
    path = str(tmp_path / "g.mtx")
    gio.write_mtx(path, row, col, val, shape, symmetry=symmetry)
    py = gio.read_mtx(path, use_native=False)
    nat = native.read_mtx_native(path)
    assert nat is not None
    ri, ci, vals, nshape = nat
    assert nshape == tuple(py.shape)
    np.testing.assert_array_equal(ri, np.asarray(py.row))
    np.testing.assert_array_equal(ci, np.asarray(py.col))
    np.testing.assert_allclose(vals, np.asarray(py.data), rtol=1e-6)


def test_native_general(tmp_path):
    rng = np.random.default_rng(0)
    uniq = {(int(r), int(c)): rng.standard_normal()
            for r, c in zip(rng.integers(0, 40, 80), rng.integers(0, 30, 80))}
    row = np.array([k[0] for k in uniq])
    col = np.array([k[1] for k in uniq])
    val = np.array(list(uniq.values()), np.float32)
    _roundtrip(tmp_path, row, col, val, (40, 30))


def test_native_symmetric_with_self_loops(tmp_path):
    row = np.array([1, 2, 2, 0, 3])
    col = np.array([0, 0, 1, 0, 3])
    val = np.array([1.0, 2.0, 3.0, 9.0, 4.0], np.float32)
    _roundtrip(tmp_path, row, col, val, (4, 4), symmetry="symmetric")


def test_native_pattern(tmp_path):
    path = str(tmp_path / "p.mtx")
    gio.write_mtx(path, [2, 0, 1], [0, 1, 2], None, (3, 3))
    ri, ci, vals, shape = native.read_mtx_native(path)
    np.testing.assert_array_equal(ri, [0, 1, 2])
    np.testing.assert_array_equal(vals, np.ones(3, np.float32))


def test_native_scientific_notation(tmp_path):
    path = str(tmp_path / "s.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write("% a comment line\n")
        f.write("2 2 2\n1 1 1.5e-3\n2 2 -2.25E+2\n")
    ri, ci, vals, shape = native.read_mtx_native(path)
    np.testing.assert_allclose(vals, [1.5e-3, -225.0], rtol=1e-6)


def test_native_error_on_bad_file(tmp_path):
    path = str(tmp_path / "bad.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")
    with pytest.raises(ValueError, match="banner"):
        native.read_mtx_native(path)


def test_native_coo_to_csr():
    rows = np.array([0, 0, 2, 2, 2, 5], np.int32)
    indptr = native.coo_to_csr_native(rows, 6)
    np.testing.assert_array_equal(indptr, [0, 2, 2, 5, 5, 5, 6])


def test_native_csr_to_csc_matches_jax():
    import jax.numpy as jnp

    from gespmm_tpu.sparse.formats import csr_to_csc
    from tests.conftest import random_csr

    csr, mat = random_csr(37, 29, density=0.15, seed=3)
    colptr, rows, perm = native.csr_to_csc_native(
        np.asarray(csr.indptr), np.asarray(csr.indices), 37, 29
    )
    csc, jperm = csr_to_csc(csr, return_permutation=True)
    np.testing.assert_array_equal(colptr, np.asarray(csc.indptr))
    np.testing.assert_array_equal(rows, np.asarray(csc.indices))
    np.testing.assert_array_equal(perm, np.asarray(jperm))


def test_native_reader_used_by_default(tmp_path):
    # read_mtx(use_native=True) must give identical results to the py path.
    rng = np.random.default_rng(5)
    uniq = {(int(r), int(c)): rng.standard_normal()
            for r, c in zip(rng.integers(0, 25, 60), rng.integers(0, 25, 60))}
    row = np.array([k[0] for k in uniq])
    col = np.array([k[1] for k in uniq])
    val = np.array(list(uniq.values()), np.float32)
    path = str(tmp_path / "d.mtx")
    gio.write_mtx(path, row, col, val, (25, 25), symmetry="symmetric")
    a = gio.read_mtx(path, use_native=True)
    b = gio.read_mtx(path, use_native=False)
    np.testing.assert_array_equal(np.asarray(a.row), np.asarray(b.row))
    np.testing.assert_array_equal(np.asarray(a.col), np.asarray(b.col))
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data), rtol=1e-6)


def test_native_chunk_packing_matches_python(monkeypatch):
    """build_tiled_plan's native C++ packer must equal the NumPy walk."""
    import numpy as np

    from gespmm_tpu.sparse.partition import build_tiled_plan
    from gespmm_tpu.utils import native
    from tests.conftest import powerlaw_csr, random_csr

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    for csr, _ in (
        random_csr(120, 100, density=0.08, seed=21),
        powerlaw_csr(100, 90, avg_deg=9, seed=22),
    ):
        kw = dict(col_tile=32, rows_per_block=16, chunk_nnz=16,
                  part_rows=64)
        plan_native = build_tiled_plan(csr, **kw)

        monkeypatch.setattr(
            "gespmm_tpu.utils.native.pack_chunks_native",
            lambda *a, **k: None,
        )
        plan_py = build_tiled_plan(csr, **kw)

        assert len(plan_native.parts) == len(plan_py.parts)
        for pn, pp in zip(plan_native.parts, plan_py.parts):
            assert pn.tile_slices == pp.tile_slices
            np.testing.assert_array_equal(np.asarray(pn.src), np.asarray(pp.src))
            np.testing.assert_array_equal(
                np.asarray(pn.lcols), np.asarray(pp.lcols)
            )
            np.testing.assert_array_equal(
                np.asarray(pn.local_rows), np.asarray(pp.local_rows)
            )
            np.testing.assert_array_equal(
                np.asarray(pn.row_start), np.asarray(pp.row_start)
            )


def test_native_fennel_matches_python_oracle(monkeypatch):
    """The C++ partitioner must reproduce the NumPy loop decision-for-
    decision (same degree-desc stream, same scores, same lowest-index
    tie-break — ties are common and cascade, so exact agreement is the
    only meaningful contract)."""
    import numpy as np

    import gespmm_tpu.utils.native as nat
    from gespmm_tpu.sparse.reorder import apply_permutation, fennel_partition
    from gespmm_tpu.utils.datasets import sbm_graph

    if not nat.available():
        pytest.skip("native lib unavailable")
    ds = sbm_graph(n_per_class=60, num_classes=6, p_in=0.15, p_out=0.004,
                   seed=9)
    rng = np.random.default_rng(9)
    csr = apply_permutation(ds.csr, rng.permutation(360))
    indptr = np.asarray(csr.indptr).astype(np.int32)
    indices = np.asarray(csr.indices).astype(np.int32)

    lab_nat = nat.fennel_partition_native(indptr, indices, 4, passes=2)

    # Force the Python loop (fennel_partition would route to native).
    monkeypatch.setattr(nat, "fennel_partition_native",
                        lambda *a, **k: None)
    lab_py = fennel_partition(csr, 4, passes=2, slack=0.1)
    # The Python path adds ~1e-9 RNG jitter that reorders which shard
    # id wins EXACT ties (a pure relabeling on the early all-tied
    # decisions) — compare up to canonical relabeling by first
    # appearance, plus the structural metrics.
    def canon(lab):
        seen, out = {}, np.empty_like(lab)
        for i, x in enumerate(lab):
            out[i] = seen.setdefault(int(x), len(seen))
        return out

    cn, cp = canon(lab_nat), canon(lab_py)
    rows = np.repeat(np.arange(360), np.diff(indptr))
    cut_nat = int((lab_nat[rows] != lab_nat[indices]).sum())
    cut_py = int((lab_py[rows] != lab_py[indices]).sum())
    assert sorted(np.bincount(lab_nat)) == sorted(np.bincount(lab_py))
    assert abs(cut_nat - cut_py) <= 0.05 * max(cut_py, 1), (cut_nat, cut_py)
    mismatch = int((cn != cp).sum())
    assert mismatch <= 18, f"{mismatch}/360 labels differ after relabeling"
