"""ctypes bindings for the native C++ graph-IO library.

Builds `native/libgespmm_io.so` on first use (g++, cached) and exposes the
fast ingest/transform path.  Every entry point returns None / raises when
the library is unavailable, and callers (sparse/io.py) fall back to the
NumPy implementations — the two paths are semantically identical and
cross-tested in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "graphio.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libgespmm_io.so"))
    if not os.path.exists(src):
        return None
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
                 "-o", so, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.gio_read_mtx.restype = ctypes.c_void_p
    lib.gio_read_mtx.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.gio_error.restype = ctypes.c_char_p
    lib.gio_error.argtypes = [ctypes.c_void_p]
    for f in ("gio_nnz", "gio_rows", "gio_cols"):
        getattr(lib, f).restype = ctypes.c_int64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.gio_copy_out.restype = None
    lib.gio_copy_out.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float32),
    ]
    lib.gio_free.restype = None
    lib.gio_free.argtypes = [ctypes.c_void_p]
    lib.gio_coo_to_csr.restype = None
    lib.gio_coo_to_csr.argtypes = [
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.gio_csr_to_csc.restype = None
    lib.gio_csr_to_csc.argtypes = [
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.gio_fennel_partition.restype = None
    lib.gio_fennel_partition.argtypes = [
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_int32,
        ctypes.c_double,
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.gio_pack_chunks.restype = ctypes.c_int64
    lib.gio_pack_chunks.argtypes = [
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            if os.environ.get("GESPMM_TPU_NO_NATIVE"):
                _LIB = None
            else:
                _LIB = _build_and_load()
        return _LIB


def available() -> bool:
    return get_lib() is not None


def read_mtx_native(
    path: str,
    symmetrize: Optional[bool] = None,
    remove_self_loops: bool = True,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]]:
    """Parse a .mtx file natively. Returns (row, col, val, shape) or None."""
    lib = get_lib()
    if lib is None:
        return None
    mode = 0 if symmetrize is None else (1 if symmetrize else 2)
    h = lib.gio_read_mtx(
        path.encode(), mode, 1 if remove_self_loops else 0
    )
    try:
        err = lib.gio_error(h)
        if err:
            raise ValueError(f"native mtx parse: {err.decode()}")
        nnz = lib.gio_nnz(h)
        shape = (lib.gio_rows(h), lib.gio_cols(h))
        ri = np.empty(nnz, np.int32)
        ci = np.empty(nnz, np.int32)
        vals = np.empty(nnz, np.float32)
        if nnz:
            lib.gio_copy_out(h, ri, ci, vals)
        return ri, ci, vals, shape
    finally:
        lib.gio_free(h)


def coo_to_csr_native(rows: np.ndarray, m: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    indptr = np.empty(m + 1, np.int32)
    lib.gio_coo_to_csr(rows, rows.shape[0], m, indptr)
    return indptr


def csr_to_csc_native(
    indptr: np.ndarray, indices: np.ndarray, m: int, n: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (colptr, rows, perm) with perm: csc pos -> csr pos."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    nnz = int(indptr[-1])
    colptr = np.empty(n + 1, np.int32)
    out_rows = np.empty(nnz, np.int32)
    perm = np.empty(nnz, np.int32)
    lib.gio_csr_to_csc(indptr, indices, m, n, colptr, out_rows, perm)
    return colptr, out_rows, perm


def pack_chunks_native(
    rows: np.ndarray,
    tiles: np.ndarray,
    R: int,
    E: int,
    m_pad: int,
):
    """Native chunk packing for the stream-reduce plan.

    rows/tiles: one part's edges sorted by (tile, row), part-relative rows.
    Returns (local_rows (C,E), row_start (C,), slot_to_edge (C,E) with -1
    pads, chunk_tile (C,)) or None if the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    tiles = np.ascontiguousarray(tiles, np.int32)
    nnz = rows.shape[0]
    C = lib.gio_pack_chunks(rows, tiles, nnz, R, E, m_pad,
                            None, None, None, None)
    local_rows = np.empty((C, E), np.int32)
    row_start = np.empty((C,), np.int32)
    slot_to_edge = np.empty((C, E), np.int32)
    chunk_tile = np.empty((C,), np.int32)
    lib.gio_pack_chunks(
        rows, tiles, nnz, R, E, m_pad,
        local_rows.ctypes.data_as(ctypes.c_void_p),
        row_start.ctypes.data_as(ctypes.c_void_p),
        slot_to_edge.ctypes.data_as(ctypes.c_void_p),
        chunk_tile.ctypes.data_as(ctypes.c_void_p),
    )
    return local_rows, row_start, slot_to_edge, chunk_tile


def fennel_partition_native(
    indptr: np.ndarray,
    indices: np.ndarray,
    num_parts: int,
    gamma: float = 1.5,
    passes: int = 3,
    slack: float = 0.1,
) -> Optional[np.ndarray]:
    """Native streaming Fennel partition; None when the lib is missing.

    Same algorithm as sparse/reorder.fennel_partition's NumPy loop (the
    semantic oracle, cross-tested on structure metrics); ~100x faster —
    the rmat20-scale pre-pass the Python loop cannot do.
    """
    lib = get_lib()
    if lib is None:
        return None
    m = indptr.shape[0] - 1
    labels = np.empty(m, np.int32)
    lib.gio_fennel_partition(
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        m, int(num_parts), float(gamma), int(passes), float(slack),
        labels,
    )
    return labels
