"""Halo-exchange distributed SpMM: exchange only the needed remote rows.

Round 1's `dist_spmm` all-gathers the ENTIRE dense operand onto every
device — per-chip memory O(n·K) regardless of shard count, which caps the
graph size at the single-chip limit.  This module is the scalable design
(SURVEY §5.8): a host pre-pass computes, per shard pair (q → p), the sorted
unique set of B rows that shard p's edges actually touch in shard q's
range; at step time each shard gathers exactly those rows and a single
padded `all_to_all` delivers them.  Per-chip footprint becomes
n/P·K + halo·K, where halo is graph-locality-dependent (assertable — see
`HaloPartition.halo_rows`).

This is the collective re-expression of the Gunrock scatter pattern
(`gunrock-test/app/spmm/spmm_enactor.cuh:92-105`): what the GPU baseline
does with per-edge atomicAdd into remote destinations becomes one
precomputed index exchange riding ICI.

Structure per shard (row slab p):
  A_p = [A_diag | A_halo]   — columns split by ownership:
  * A_diag: columns owned by p, remapped to the local B shard [0, cpp);
  * A_halo: remote columns, remapped into the received halo table
    [0, P·H) at position (owner·H + rank-in-need-set).
  out_p = A_diag @ B_p  +  A_halo @ halo_p
The diagonal SpMM has no dependency on the collective, so XLA overlaps it
with the all_to_all.  Backward is fully automatic for the XLA tier
(gather/all_to_all/concat all have transposes) and rides a custom-VJP
tiled kernel pair for the stream tier — the flagship kernel now runs in
the sharded TRAIN step, not just inference.

Reduction monoids: sum/mean for both tiers; max/min on the XLA tier
(identity-aware combine across the diag/halo split).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gespmm_tpu.sparse.formats import CSR
from gespmm_tpu.ops import reference as ref

Array = jax.Array

# The stream-reduce kernel keeps a (rows × 128-lane) f32 accumulator
# resident in VMEM; this is the per-shard output-row ceiling it implies.
_MAX_PART_ROWS = ((64 << 20) // (4 * 128) // 8) * 8


# ---------------------------------------------------------------------------
# Uniform per-shard tiled plans (one traced program serves all shards)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LocalTiledCfg:
    """Static layout of a uniform per-shard stream plan (hashable)."""

    tile_slices: Tuple  # ((col0, ncols, slot0, slot1), ...)
    m_pad: int
    rows_per_block: int
    chunk_nnz: int
    out_rows: int
    has_data: bool
    mode: str = "trilo"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LocalTiledArrays:
    """Stacked per-shard plan arrays (leading axis = shards)."""

    lcols: Array  # (P, S)
    local_rows: Array  # (P, C, E)
    row_start: Array  # (P, C)
    vals: Optional[Array]  # (P, S) pre-chunked edge values or None

    def tree_flatten(self):
        if self.vals is None:
            return (self.lcols, self.local_rows, self.row_start), (False,)
        return (self.lcols, self.local_rows, self.row_start, self.vals), (
            True,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        if aux[0]:
            return cls(*children)
        return cls(*children, None)


def _uniform_tiled_plans(
    slabs: List[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
    out_rows: int,
    table_rows: int,
    col_tile: Optional[int] = None,
    rows_per_block: Optional[int] = None,
    chunk_nnz: int = 256,
    k_hint: int = 128,
) -> Tuple[LocalTiledCfg, LocalTiledArrays]:
    """Build one stream plan per local CSR slab, padded to a shared static
    layout (a `shard_map` requirement: one traced program, all shards).

    slabs: per shard (indptr, indices, data|None) of a local block with
    `out_rows` output rows and a `table_rows`-row gather table.
    """
    import types

    from gespmm_tpu.sparse.partition import CHUNK_GROUP, build_tiled_plan

    if out_rows > _MAX_PART_ROWS:
        raise ValueError(
            f"local block of {out_rows} output rows exceeds the per-shard "
            f"limit of {_MAX_PART_ROWS} rows (stream-kernel VMEM "
            f"accumulator budget); use more shards"
        )
    total_nnz = sum(int(ind.shape[0]) for _, ind, _ in slabs)
    if col_tile is None:
        col_tile = (
            max(table_rows, 1)
            if table_rows * 4 * k_hint <= (36 << 20)
            else 16384
        )
    if rows_per_block is None:
        n_tiles = max(-(-table_rows // col_tile), 1)
        density = total_nnz / max(len(slabs) * out_rows * n_tiles, 1)
        rows_per_block = int(
            min(1024,
                max(256, -(-int(1.6 * chunk_nnz / max(density, 1e-9)) // 8) * 8))
        )
    E = int(chunk_nnz)

    plans = []
    for indptr, indices, data in slabs:
        slab = types.SimpleNamespace(
            indptr=indptr, indices=indices, data=None,
            shape=(out_rows, table_rows), nnz=int(indices.shape[0]),
        )
        plan = build_tiled_plan(
            slab, col_tile=col_tile, rows_per_block=rows_per_block,
            chunk_nnz=E, part_rows=1 << 62,
        )
        if len(plan.parts) != 1:
            raise ValueError(
                f"local block of {out_rows} rows split into "
                f"{len(plan.parts)} parts; exceeds the per-shard limit of "
                f"{_MAX_PART_ROWS} rows"
            )
        plans.append(plan.parts[0])

    # Per column tile, pad every shard to the max chunk count.
    tile_ids = sorted(
        {c0 // col_tile for pp in plans for c0, _, _, _ in pp.tile_slices}
    ) or [0]
    per_tile = {}
    for t in tile_ids:
        cmax = 1
        for pp in plans:
            for c0, _, s0, s1 in pp.tile_slices:
                if c0 // col_tile == t:
                    cmax = max(cmax, (s1 - s0) // E)
        per_tile[t] = cmax
    C = sum(per_tile.values())
    group = CHUNK_GROUP if C > 8 else 4
    if C % group:
        per_tile[tile_ids[-1]] += (-C) % group
        C = sum(per_tile.values())
    S = C * E
    R = plans[0].rows_per_block
    m_pad = max(pp.m_pad for pp in plans)
    Pn = len(slabs)

    lcols = np.zeros((Pn, S), np.int32)
    local_rows = np.full((Pn, C, E), R, np.int32)
    row_start = np.zeros((Pn, C), np.int32)
    has_data = any(d is not None for _, _, d in slabs)
    vals = np.zeros((Pn, S), np.float32) if has_data else None
    tile_slices = []
    off = 0
    for t in tile_ids:
        ct = per_tile[t]
        col0 = t * col_tile
        ncols = min(col_tile, table_rows - col0)
        tile_slices.append((col0, ncols, off * E, (off + ct) * E))
        for p, pp in enumerate(plans):
            data = slabs[p][2]
            for c0, _, s0, s1 in pp.tile_slices:
                if c0 // col_tile != t:
                    continue
                nch = (s1 - s0) // E
                ch0 = s0 // E
                lcols[p, off * E : off * E + (s1 - s0)] = np.asarray(
                    pp.lcols[s0:s1]
                )
                local_rows[p, off : off + nch] = np.asarray(
                    pp.local_rows[ch0 : ch0 + nch]
                )
                row_start[p, off : off + nch] = np.asarray(
                    pp.row_start[ch0 : ch0 + nch]
                )
                if vals is not None:
                    src = np.asarray(pp.src[s0:s1])
                    lr = np.asarray(pp.local_rows[ch0 : ch0 + nch]).reshape(-1)
                    v = (
                        data[np.minimum(src, max(len(data) - 1, 0))]
                        if data is not None and len(data)
                        else np.ones_like(src, np.float32)
                    )
                    vals[p, off * E : off * E + (s1 - s0)] = np.where(
                        lr < R, v, 0.0
                    )
        off += ct

    cfg = LocalTiledCfg(
        tile_slices=tuple(tile_slices),
        m_pad=m_pad,
        rows_per_block=R,
        chunk_nnz=E,
        out_rows=out_rows,
        has_data=has_data,
    )
    arrays = LocalTiledArrays(
        lcols=jnp.asarray(lcols),
        local_rows=jnp.asarray(local_rows),
        row_start=jnp.asarray(row_start),
        vals=None if vals is None else jnp.asarray(vals),
    )
    return cfg, arrays


# ---------------------------------------------------------------------------
# Local tiled SpMM with custom VJP (runs inside shard_map)
# ---------------------------------------------------------------------------


def _tiled_apply(cfg: LocalTiledCfg, lcols, local_rows, row_start, vals, B):
    """One shard's stream-reduce SpMM over its uniform plan slice."""
    from gespmm_tpu.kernels.spmm_stream import _reduce_part, _round_up

    interpret = jax.default_backend() != "tpu"
    K = B.shape[1]
    budget_rows = (64 * 1024 * 1024) // max(cfg.m_pad * 4, 1)
    kt_max = max(128, (min(512, budget_rows) // 128) * 128)
    if K <= kt_max:
        K_pad = kt = K
    else:
        # multi-pass: the resident window double-buffers (halved budget)
        kt_max = max(128, (min(512, budget_rows // 2) // 128) * 128)
        K_pad = _round_up(K, 128)
        kt = kt_max
        while K_pad % kt:
            kt -= 128
    B32 = B.astype(jnp.float32)
    if K_pad != K:
        B32 = jnp.pad(B32, ((0, 0), (0, K_pad - K)))
    pieces = [
        jnp.take(B32[c0 : c0 + nc], lcols[s0:s1], axis=0)
        for c0, nc, s0, s1 in cfg.tile_slices
    ]
    contrib = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
    if vals is not None:
        contrib = contrib * vals[:, None]
    out = _reduce_part(
        contrib, local_rows, row_start, cfg.m_pad, cfg.rows_per_block,
        kt, cfg.mode, interpret, op="sum",
    )
    return out[: cfg.out_rows, :K].astype(B.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _local_tiled(cfg_f: LocalTiledCfg, cfg_b: LocalTiledCfg,
                 lcols_f, lrows_f, rstart_f, vals_f,
                 lcols_b, lrows_b, rstart_b, vals_b, B):
    """Differentiable per-shard tiled SpMM; backward runs the transposed
    local block through the same kernel (grads w.r.t. B only — edge
    values are captured in the plan at partition time)."""
    return _tiled_apply(cfg_f, lcols_f, lrows_f, rstart_f, vals_f, B)


def _local_tiled_fwd(cfg_f, cfg_b, lcols_f, lrows_f, rstart_f, vals_f,
                     lcols_b, lrows_b, rstart_b, vals_b, B):
    out = _tiled_apply(cfg_f, lcols_f, lrows_f, rstart_f, vals_f, B)
    return out, (lcols_b, lrows_b, rstart_b, vals_b)


def _local_tiled_bwd(cfg_f, cfg_b, res, g):
    lcols_b, lrows_b, rstart_b, vals_b = res
    # cfg_b.out_rows == the forward's table row count, so grad_B already
    # has B's shape; cotangent dtype matches B's.
    grad_B = _tiled_apply(cfg_b, lcols_b, lrows_b, rstart_b, vals_b, g)
    return (None, None, None, None, None, None, None, None, grad_B)


_local_tiled.defvjp(_local_tiled_fwd, _local_tiled_bwd)


# ---------------------------------------------------------------------------
# Halo partition (host pre-pass)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HaloPartition:
    """Row-slab partition with per-shard diag/halo splits + exchange plan.

    Arrays (P shards, H halo rows per (owner, dest) pair):
      send_idx:   (P, P, H) int32 — send_idx[q, p] = B-shard-local rows
                  shard q sends to shard p (pad -> 0).
      diag_*:     per-shard CSR over local columns [0, cpp)  (phantom-row
                  nnz padding with mask, as PartitionedAdjacency).
      halo_*:     per-shard CSR over the received halo table [0, P*H).
      deg:        (P, rpp) f32 — TOTAL row degree (for mean).
    Static: shape (m, n), rpp, cpp, H; optional uniform tiled plans for
      diag/halo forward+backward (the differentiable stream tier).
    """

    send_idx: Array
    diag_indptr: Array
    diag_indices: Array
    diag_data: Optional[Array]
    diag_mask: Array
    halo_indptr: Array
    halo_indices: Array
    halo_data: Optional[Array]
    halo_mask: Array
    deg: Array
    shape: Tuple[int, int]
    rpp: int
    cpp: int
    H: int
    tiled_cfgs: Optional[Tuple[LocalTiledCfg, ...]] = None
    tiled_arrays: Optional[Tuple[LocalTiledArrays, ...]] = None

    def tree_flatten(self):
        arrays = (
            self.send_idx, self.diag_indptr, self.diag_indices,
            self.diag_data, self.diag_mask, self.halo_indptr,
            self.halo_indices, self.halo_data, self.halo_mask, self.deg,
            self.tiled_arrays,
        )
        aux = (self.shape, self.rpp, self.cpp, self.H, self.tiled_cfgs)
        return arrays, aux

    @classmethod
    def tree_unflatten(cls, aux, arrays):
        (send_idx, dip, dii, did, dim_, hip, hii, hid, him, deg,
         tarr) = arrays
        shape, rpp, cpp, H, tcfg = aux
        return cls(send_idx, dip, dii, did, dim_, hip, hii, hid, him, deg,
                   shape, rpp, cpp, H, tcfg, tarr)

    @property
    def num_parts(self) -> int:
        return int(self.send_idx.shape[0])

    @property
    def halo_rows(self) -> int:
        """Halo-table rows per shard — the communicated footprint.

        Per-shard dense memory is (cpp + halo_rows)·K·4 bytes, vs n·K·4
        for the all-gather formulation."""
        return self.num_parts * self.H

    @property
    def footprint_fraction(self) -> float:
        """(local + halo) rows / total rows — 1/P + halo share."""
        return (self.cpp + self.halo_rows) / max(self.shape[1], 1)


def _transpose_local(indptr, indices, data, rows_out, rows_of_edge):
    """CSC ordering of a local block (host): returns (indptr_t, indices_t,
    data_t) with `rows_out` output rows (= the block's column count)."""
    order = np.argsort(indices, kind="stable")
    ind_t = rows_of_edge[order].astype(np.int32)
    ptr_t = np.zeros(rows_out + 1, np.int64)
    np.add.at(ptr_t, indices + 1, 1)
    ptr_t = np.cumsum(ptr_t).astype(np.int32)
    d_t = None if data is None else data[order]
    return ptr_t, ind_t, d_t


def build_halo_partition(
    csr: CSR,
    num_parts: int,
    *,
    tiled: bool = True,
    chunk_nnz: int = 256,
    col_tile: Optional[int] = None,
    rows_per_block: Optional[int] = None,
) -> HaloPartition:
    """Host pre-pass: slab rows, split columns by ownership, compute the
    per-pair halo index sets, remap, and (optionally) build the uniform
    stream plans for the differentiable tiled tier."""
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = None if csr.data is None else np.asarray(csr.data)
    m, n = csr.shape
    Pn = num_parts
    rpp = -(-m // Pn)
    cpp = -(-n // Pn)
    rows_all = np.repeat(np.arange(m, dtype=np.int32), np.diff(indptr))

    # Pass 1: per shard, split edges and collect need-sets.
    shard_edges = []  # (lrows, cols, vals, owner) for each shard
    need = [[None] * Pn for _ in range(Pn)]  # need[p][q] sorted unique cols
    H = 1
    for p in range(Pn):
        r0, r1 = p * rpp, min((p + 1) * rpp, m)
        s, e = int(indptr[min(r0, m)]), int(indptr[min(r1, m)])
        lrows = rows_all[s:e] - r0
        cols = indices[s:e]
        vals = None if data is None else data[s:e]
        owner = cols // cpp
        shard_edges.append((lrows, cols, vals, owner))
        for q in range(Pn):
            if q == p:
                continue
            cq = np.unique(cols[owner == q])
            need[p][q] = cq
            H = max(H, len(cq))
    H = -(-H // 8) * 8  # 8-aligned for clean layouts

    send_idx = np.zeros((Pn, Pn, H), np.int32)
    for p in range(Pn):
        for q in range(Pn):
            if q == p or need[p][q] is None:
                continue
            cq = need[p][q]
            send_idx[q, p, : len(cq)] = cq - q * cpp

    # Pass 2: build local diag/halo CSRs (+ padded stacks + transposes).
    def stack_csrs(blocks, rows):
        max_nnz = max(max((b[1].shape[0] for b in blocks), default=1), 1)
        ip = np.zeros((Pn, rows + 1), np.int32)
        ii = np.zeros((Pn, max_nnz), np.int32)
        msk = np.zeros((Pn, max_nnz), bool)
        dd = (
            np.zeros((Pn, max_nnz), np.float32)
            if any(b[2] is not None for b in blocks)
            else None
        )
        for p, (lp, li, ld) in enumerate(blocks):
            ip[p, : lp.shape[0]] = lp
            if lp.shape[0] < rows + 1:
                ip[p, lp.shape[0]:] = lp[-1]
            ii[p, : li.shape[0]] = li
            msk[p, : li.shape[0]] = True
            if dd is not None and ld is not None:
                dd[p, : li.shape[0]] = ld
        return ip, ii, dd, msk

    def local_csr(lrows, lcols, lvals, rows):
        counts = np.bincount(lrows, minlength=rows)
        lp = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return lp, lcols.astype(np.int32), lvals

    diag_blocks, halo_blocks = [], []
    diag_t_blocks, halo_t_blocks = [], []
    deg = np.zeros((Pn, rpp), np.float32)
    for p in range(Pn):
        lrows, cols, vals, owner = shard_edges[p]
        np.add.at(deg[p], lrows, 1.0)
        is_diag = owner == p
        # diag block: local column ids
        dr, dc = lrows[is_diag], (cols - p * cpp)[is_diag]
        dv = None if vals is None else vals[is_diag]
        order = np.argsort(dr, kind="stable")  # rows must be sorted
        dr, dc = dr[order], dc[order]
        dv = None if dv is None else dv[order]
        diag_blocks.append(local_csr(dr, dc, dv, rpp))
        diag_t_blocks.append(_transpose_local(*diag_blocks[-1][:2],
                                              diag_blocks[-1][2], cpp, dr)
                             if len(dr) else
                             (np.zeros(cpp + 1, np.int32),
                              np.zeros(0, np.int32), None))
        # halo block: remap remote cols to owner*H + rank
        hr_mask = ~is_diag
        hr, hc_g, ho = lrows[hr_mask], cols[hr_mask], owner[hr_mask]
        hv = None if vals is None else vals[hr_mask]
        hc = np.zeros_like(hc_g)
        for q in range(Pn):
            if q == p:
                continue
            sel = ho == q
            if not sel.any():
                continue
            hc[sel] = q * H + np.searchsorted(need[p][q], hc_g[sel])
        order = np.argsort(hr, kind="stable")
        hr, hc = hr[order], hc[order]
        hv = None if hv is None else hv[order]
        halo_blocks.append(local_csr(hr, hc, hv, rpp))
        halo_t_blocks.append(_transpose_local(*halo_blocks[-1][:2],
                                              halo_blocks[-1][2], Pn * H, hr)
                             if len(hr) else
                             (np.zeros(Pn * H + 1, np.int32),
                              np.zeros(0, np.int32), None))

    dip, dii, did, dim_ = stack_csrs(diag_blocks, rpp)
    hip, hii, hid, him = stack_csrs(halo_blocks, rpp)

    tiled_cfgs = tiled_arrays = None
    if tiled:
        slabs_df = [(b[0], b[1], b[2]) for b in diag_blocks]
        slabs_db = [(b[0], b[1], b[2]) for b in diag_t_blocks]
        slabs_hf = [(b[0], b[1], b[2]) for b in halo_blocks]
        slabs_hb = [(b[0], b[1], b[2]) for b in halo_t_blocks]
        kw = dict(col_tile=col_tile, rows_per_block=rows_per_block,
                  chunk_nnz=chunk_nnz)
        cfg_df, arr_df = _uniform_tiled_plans(slabs_df, rpp, cpp, **kw)
        cfg_db, arr_db = _uniform_tiled_plans(slabs_db, cpp, rpp, **kw)
        cfg_hf, arr_hf = _uniform_tiled_plans(slabs_hf, rpp, Pn * H, **kw)
        cfg_hb, arr_hb = _uniform_tiled_plans(slabs_hb, Pn * H, rpp, **kw)
        tiled_cfgs = (cfg_df, cfg_db, cfg_hf, cfg_hb)
        tiled_arrays = (arr_df, arr_db, arr_hf, arr_hb)

    return HaloPartition(
        send_idx=jnp.asarray(send_idx),
        diag_indptr=jnp.asarray(dip),
        diag_indices=jnp.asarray(dii),
        diag_data=None if did is None else jnp.asarray(did),
        diag_mask=jnp.asarray(dim_),
        halo_indptr=jnp.asarray(hip),
        halo_indices=jnp.asarray(hii),
        halo_data=None if hid is None else jnp.asarray(hid),
        halo_mask=jnp.asarray(him),
        deg=jnp.asarray(deg),
        shape=(m, n),
        rpp=rpp,
        cpp=cpp,
        H=H,
        tiled_cfgs=tiled_cfgs,
        tiled_arrays=tiled_arrays,
    )


# ---------------------------------------------------------------------------
# Runtime op
# ---------------------------------------------------------------------------


def _local_block_spmm(indptr, indices, data, mask, table, rows, reduce):
    """One local block (diag or halo) via the XLA tier; phantom-row
    padding keeps sentinel slots out of every monoid."""
    nnz_pad = indices.shape[0]
    vals = mask.astype(table.dtype) if data is None else data * mask
    indptr_ext = jnp.concatenate(
        [indptr, jnp.full((1,), nnz_pad, indptr.dtype)]
    )
    out = ref.spmm_xla(indptr_ext, indices, vals, table, reduce=reduce)
    return out[:rows]


def halo_spmm(
    hp: HaloPartition,
    B: Array,
    mesh: Mesh,
    *,
    reduce: str = "sum",
    method: str = "auto",
    axis: str = "data",
    model_axis: Optional[str] = "model",
) -> Array:
    """C = A @ B with A row-partitioned and B row-sharded over `axis`,
    exchanging ONLY the halo rows each shard needs.

    B: (num_parts*cpp, K) sharded P(axis, model_axis); result
    (num_parts*rpp, K) sharded the same.  Differentiable: the XLA tier
    end-to-end (including edge values); the tiled tier w.r.t. B.

    method: "auto" (tiled when plans were built and reduce is sum/mean,
    else xla) | "tiled" | "xla".
    """
    if reduce not in ("sum", "mean", "max", "min"):
        raise ValueError(f"unknown reduce {reduce!r}")
    Pn, rpp, cpp, H = hp.num_parts, hp.rpp, hp.cpp, hp.H
    if B.shape[0] != Pn * cpp:
        raise ValueError(
            f"B must be padded to num_parts*cpp = {Pn * cpp} rows "
            f"(got {B.shape[0]}); pad with pad_for_halo()"
        )
    has_tiled = hp.tiled_cfgs is not None
    if method == "auto":
        method = "tiled" if (has_tiled and reduce in ("sum", "mean")) else "xla"
    if method == "tiled":
        if not has_tiled:
            raise ValueError(
                "method='tiled' needs build_halo_partition(tiled=True)"
            )
        if reduce not in ("sum", "mean"):
            raise ValueError(
                f"tiled halo tier supports reduce=sum/mean, got {reduce!r};"
                " use method='xla'"
            )
    model_in_mesh = model_axis if (model_axis in mesh.axis_names) else None

    base = reduce if reduce in ("max", "min") else "sum"
    has_dd = hp.diag_data is not None
    has_hd = hp.halo_data is not None

    def exchange(send_idx, B_shard):
        req = jnp.take(B_shard, send_idx.reshape(-1), axis=0)
        return jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                  tiled=True)

    def body_xla(send_idx, dip, dii, dd, dm, hip, hii, hd, hm, deg, B_shard):
        halo_tbl = exchange(send_idx[0], B_shard)
        od = _local_block_spmm(dip[0], dii[0], dd[0] if has_dd else None,
                               dm[0], B_shard, rpp, base)
        oh = _local_block_spmm(hip[0], hii[0], hd[0] if has_hd else None,
                               hm[0], halo_tbl, rpp, base)
        if base in ("max", "min"):
            ident = -jnp.inf if base == "max" else jnp.inf
            fold = jnp.maximum if base == "max" else jnp.minimum
            ddeg = (dip[0][1:] - dip[0][:-1])[:, None]
            hdeg = (hip[0][1:] - hip[0][:-1])[:, None]
            out = fold(
                jnp.where(ddeg > 0, od.astype(jnp.float32), ident),
                jnp.where(hdeg > 0, oh.astype(jnp.float32), ident),
            )
            out = jnp.where(jnp.isfinite(out), out, 0.0).astype(B_shard.dtype)
        else:
            out = od + oh
        if reduce == "mean":
            out = out / jnp.maximum(deg[0], 1.0)[:, None]
        return out

    def body_tiled(send_idx, deg, arr_df, arr_db, arr_hf, arr_hb, B_shard):
        cfg_df, cfg_db, cfg_hf, cfg_hb = hp.tiled_cfgs
        halo_tbl = exchange(send_idx[0], B_shard)

        def sl(a: LocalTiledArrays):
            return (a.lcols[0], a.local_rows[0], a.row_start[0],
                    None if a.vals is None else a.vals[0])

        od = _local_tiled(cfg_df, cfg_db, *sl(arr_df), *sl(arr_db), B_shard)
        oh = _local_tiled(cfg_hf, cfg_hb, *sl(arr_hf), *sl(arr_hb), halo_tbl)
        out = od + oh
        if reduce == "mean":
            out = out / jnp.maximum(deg[0], 1.0)[:, None]
        return out

    sx = P(axis, None)
    if method == "tiled":
        arrs = hp.tiled_arrays

        # Specs matching the pytree structure of each LocalTiledArrays.
        def arr_spec(a: LocalTiledArrays):
            return LocalTiledArrays(
                lcols=P(axis, None),
                local_rows=P(axis, None, None),
                row_start=P(axis, None),
                vals=None if a.vals is None else P(axis, None),
            )

        in_specs = (
            P(axis, None, None), sx,
            arr_spec(arrs[0]), arr_spec(arrs[1]),
            arr_spec(arrs[2]), arr_spec(arrs[3]),
            P(axis, model_in_mesh),
        )
        fn = shard_map(
            body_tiled, mesh=mesh, in_specs=in_specs,
            out_specs=P(axis, model_in_mesh), check_vma=False,
        )
        return fn(hp.send_idx, hp.deg, *arrs, B)

    args = [hp.send_idx, hp.diag_indptr, hp.diag_indices]
    in_specs = [P(axis, None, None), sx, sx]
    dd = hp.diag_data if has_dd else jnp.zeros((1, 1), B.dtype)
    hd = hp.halo_data if has_hd else jnp.zeros((1, 1), B.dtype)
    args += [dd, hp.diag_mask, hp.halo_indptr, hp.halo_indices, hd,
             hp.halo_mask, hp.deg, B]
    in_specs += [sx if has_dd else P(None, None), sx, sx, sx,
                 sx if has_hd else P(None, None), sx, sx,
                 P(axis, model_in_mesh)]
    fn = shard_map(
        body_xla, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(axis, model_in_mesh), check_vma=False,
    )
    return fn(*args)


def pad_for_halo(hp: HaloPartition, X: Array) -> Array:
    """Pad a node-indexed array to num_parts*cpp rows (B-side layout)."""
    pad = hp.num_parts * hp.cpp - X.shape[0]
    if pad < 0:
        raise ValueError(f"array has {X.shape[0]} rows > {hp.num_parts * hp.cpp}")
    if pad == 0:
        return X
    return jnp.pad(X, ((0, pad),) + ((0, 0),) * (X.ndim - 1))
