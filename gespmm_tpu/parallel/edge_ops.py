"""Sharded edge-space ops: SDDMM, additive attention logits, edge softmax.

Completes the SDDMM/attention op surface (the reference exposes it only
single-GPU and forward-only, `pytorch-custom/sddmm.cpp:63-68`) in the
distributed regime: every per-edge op runs under `shard_map` over the
same row-slab :class:`~gespmm_tpu.parallel.halo.HaloPartition` as
``halo_spmm``, with the column-side dense rows arriving via the identical
ragged ppermute schedule (`halo.make_exchange`).

Per-edge values live in the SHARD-LOCAL stacked layout — a
``(P, d_nnz[, H])`` diag block plus a ``(P, h_nnz[, H])`` halo block,
sharded ``P(axis)`` — the exact layout ``halo_spmm``'s runtime edge
values consume.  A full attention layer therefore composes as

    logits = halo_additive_logits(...)      # or halo_sddmm(...)
    alpha  = halo_edge_softmax(hp, leaky_relu(logits_d), ..., mesh)
    out    = halo_spmm(hp, x, mesh, diag_vals=alpha_d, halo_vals=alpha_h)

without ever materializing the global nnz-length edge array, re-permuting
edges, or adding a collective beyond the one feature exchange per op.

Why edge softmax needs NO collective: every edge lives on the shard that
owns its destination row, so a per-destination-row softmax touches only
shard-local values (diag + halo blocks of the same row slab).

Everything is differentiable by construction — the bodies are built from
``take``/``ppermute``/``segment_*``, whose transposes (scatter-add,
reverse ppermute) autodiff derives, including the reverse collectives for
the column-side gradients.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gespmm_tpu.parallel.halo import HaloPartition, make_exchange
from gespmm_tpu.sparse.formats import expand_indptr

Array = jax.Array


def _edge_spec(axis: str, ndim: int):
    return P(axis, *([None] * (ndim - 1)))


def _rows_of(indptr, nnz_pad: int):
    """Per-slot local row ids of a padded per-shard CSR block; padded
    slots land on the last non-empty row (callers mask them)."""
    return expand_indptr(indptr, nnz_pad)


def halo_sddmm(
    hp: HaloPartition,
    D1: Array,
    D2: Array,
    mesh: Mesh,
    *,
    axis: str = "data",
    model_axis: Optional[str] = "model",
) -> Tuple[Array, Array]:
    """Sharded SDDMM: out[e] = D1[row_e] · D2[col_e] for every edge.

    D1: (P·rpp, K) row-sharded over ``axis`` (destination-side operand);
    D2: (P·cpp, K) row-sharded (source-side — pad with ``pad_for_halo``).
    When ``model_axis`` is in the mesh, K may be sharded over it; the
    contraction psums across model shards and the edge values come back
    replicated on that axis.

    Returns ``(diag_vals, halo_vals)``: (P, d_nnz) / (P, h_nnz) stacked
    per-shard edge values (padded slots zero), sharded ``P(axis)`` — feed
    them to :func:`halo_edge_softmax` / ``halo_spmm(diag_vals=..., ...)``
    or scatter to global CSR order with :func:`merge_edge_values`.

    ≙ `sddmm.cpp:63-68` distributed: the reference never had a
    multi-device SDDMM; here the D2 halo rows ride the same exchange
    schedule as the SpMM operand.
    """
    if D1.ndim != 2 or D2.ndim != 2 or D1.shape[1] != D2.shape[1]:
        raise ValueError(f"D1 {D1.shape} / D2 {D2.shape} must be (m,K)/(n,K)")
    Pn, rpp, cpp = hp.num_parts, hp.rpp, hp.cpp
    if D1.shape[0] != Pn * rpp or D2.shape[0] != Pn * cpp:
        raise ValueError(
            f"D1/D2 must be padded to (num_parts*rpp, num_parts*cpp) rows "
            f"= ({Pn * rpp}, {Pn * cpp}), got {D1.shape[0]}/{D2.shape[0]}; "
            f"use pad_for_halo()"
        )
    d_nnz = hp.diag_indices.shape[1]
    h_nnz = hp.halo_indices.shape[1]
    exchange = make_exchange(hp, axis)
    model_in = model_axis if (model_axis in mesh.axis_names) else None

    def body(send_idx, dip, dii, dmask, hip, hii, hmask, d1, d2):
        halo_tbl = exchange(send_idx[0], d2)
        rows_d = _rows_of(dip[0], d_nnz)
        rows_h = _rows_of(hip[0], h_nnz)
        dv = jnp.sum(
            jnp.take(d1, rows_d, axis=0) * jnp.take(d2, dii[0], axis=0),
            axis=-1,
        )
        hv = jnp.sum(
            jnp.take(d1, rows_h, axis=0) * jnp.take(halo_tbl, hii[0], axis=0),
            axis=-1,
        )
        if model_in is not None:
            dv = jax.lax.psum(dv, model_in)
            hv = jax.lax.psum(hv, model_in)
        dv = dv * dmask[0].astype(dv.dtype)
        hv = hv * hmask[0].astype(hv.dtype)
        return dv[None], hv[None]

    sx = P(axis, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sx, sx, sx, sx, sx, sx, sx,
                  P(axis, model_in), P(axis, model_in)),
        out_specs=(sx, sx),
        check_vma=False,
    )
    return fn(hp.send_idx, hp.diag_indptr, hp.diag_indices, hp.diag_mask,
              hp.halo_indptr, hp.halo_indices, hp.halo_mask, D1, D2)


def halo_additive_logits(
    hp: HaloPartition,
    src_score: Array,
    dst_score: Array,
    mesh: Mesh,
    *,
    axis: str = "data",
) -> Tuple[Array, Array]:
    """Sharded GATv1 additive logits: e = src[row_e] + dst[col_e].

    ``src_score``: (P·rpp,) or (P·rpp, H), row-sharded; ``dst_score``:
    (P·cpp,) or (P·cpp, H), row-sharded (``pad_for_halo`` layout).  Only
    the H-wide ``dst_score`` crosses the wire — the cheap rank-2
    decomposition of the SDDMM (see ``ops.graph.additive_attention_logits``)
    carried into the distributed regime.

    Returns ``(diag_logits, halo_logits)``: (P, d_nnz[, H]) / (P,
    h_nnz[, H]) stacked per-shard, padded slots zero.
    """
    squeeze = src_score.ndim == 1
    s2 = src_score[:, None] if squeeze else src_score
    t2 = dst_score[:, None] if squeeze else dst_score
    Pn, rpp, cpp = hp.num_parts, hp.rpp, hp.cpp
    if s2.shape[0] != Pn * rpp or t2.shape[0] != Pn * cpp:
        raise ValueError(
            f"src/dst scores must be padded to {Pn * rpp}/{Pn * cpp} rows, "
            f"got {s2.shape[0]}/{t2.shape[0]}; use pad_for_halo()"
        )
    d_nnz = hp.diag_indices.shape[1]
    h_nnz = hp.halo_indices.shape[1]
    exchange = make_exchange(hp, axis)

    def body(send_idx, dip, dii, dmask, hip, hii, hmask, s, t):
        halo_tbl = exchange(send_idx[0], t)
        rows_d = _rows_of(dip[0], d_nnz)
        rows_h = _rows_of(hip[0], h_nnz)
        dv = jnp.take(s, rows_d, axis=0) + jnp.take(t, dii[0], axis=0)
        hv = jnp.take(s, rows_h, axis=0) + jnp.take(halo_tbl, hii[0], axis=0)
        dv = dv * dmask[0][:, None].astype(dv.dtype)
        hv = hv * hmask[0][:, None].astype(hv.dtype)
        return dv[None], hv[None]

    sx = P(axis, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sx, sx, sx, sx, sx, sx, sx, sx, sx),
        out_specs=(P(axis, None, None), P(axis, None, None)),
        check_vma=False,
    )
    dv, hv = fn(hp.send_idx, hp.diag_indptr, hp.diag_indices, hp.diag_mask,
                hp.halo_indptr, hp.halo_indices, hp.halo_mask, s2, t2)
    if squeeze:
        dv, hv = dv[..., 0], hv[..., 0]
    return dv, hv


def halo_edge_softmax(
    hp: HaloPartition,
    diag_logits: Array,
    halo_logits: Array,
    mesh: Mesh,
    *,
    axis: str = "data",
) -> Tuple[Array, Array]:
    """Per-destination-row softmax over sharded edge logits.

    Purely shard-local (no collective): each edge lives on the shard
    owning its destination row, and the normalization combines that
    row's diag AND halo edges.  Inputs/outputs in the stacked per-shard
    layout of :func:`halo_sddmm` (with or without a trailing head dim);
    padded slots come back exactly zero.  Differentiable (the softmax
    Jacobian falls out of autodiff; the row-max shift is
    ``stop_gradient``-ed as usual).
    """
    squeeze = diag_logits.ndim == 2
    dl = diag_logits[..., None] if squeeze else diag_logits
    hl = halo_logits[..., None] if squeeze else halo_logits
    Pn, rpp = hp.num_parts, hp.rpp
    d_nnz = hp.diag_indices.shape[1]
    h_nnz = hp.halo_indices.shape[1]
    # Large-FINITE mask fill, not -inf: XLA:CPU's fusion of the fully
    # chained softmax miscomputes NaN on masked slots when ±inf flows
    # through the select/exp chain (reproduced: returning intermediates
    # makes it vanish).  With -1e30 every op stays finite and
    # exp(-1e30 - mx) underflows to exactly 0.
    neg = -1e30

    def body(dip, dmask, hip, hmask, dv, hv):
        rows_d = _rows_of(dip[0], d_nnz)
        rows_h = _rows_of(hip[0], h_nnz)
        dm = dmask[0][:, None]
        hm = hmask[0][:, None]
        md = jnp.where(dm, dv[0], neg)
        mh = jnp.where(hm, hv[0], neg)
        mx = jnp.maximum(
            jax.ops.segment_max(md, rows_d, num_segments=rpp),
            jax.ops.segment_max(mh, rows_h, num_segments=rpp),
        )
        # Empty rows (both blocks all-masked) keep the fill value; shift
        # them to 0 so the subtraction below never cancels -1e30 - -1e30.
        mx = jax.lax.stop_gradient(jnp.where(mx <= neg / 2, 0.0, mx))
        # Shifted logits clamped to >= -100 before exp: XLA:CPU's
        # vectorized exp NaNs on hugely negative inputs (its range
        # reduction overflows int32 around |x| ~ 1e30 — reproduced: the
        # padded -1e30 slots came back NaN), and exp(-100) ~ 4e-44 is
        # already subnormal-zero.  The mask multiply AFTER exp is then
        # safe (finite·0) and pins padded slots to exactly 0.
        # mode="clip" keeps the default NaN-fill take branch out of the
        # graph; indices are in range by construction.
        exd = dm * jnp.exp(jnp.maximum(
            md - jnp.take(mx, rows_d, axis=0, mode="clip"), -100.0))
        exh = hm * jnp.exp(jnp.maximum(
            mh - jnp.take(mx, rows_h, axis=0, mode="clip"), -100.0))
        denom = (
            jax.ops.segment_sum(exd, rows_d, num_segments=rpp)
            + jax.ops.segment_sum(exh, rows_h, num_segments=rpp)
        )
        # Guard must be a NORMAL f32: 1e-38 is subnormal and gets
        # flushed to zero (FTZ), making empty rows divide 0/0 = NaN.
        # Rows with any valid edge have denom >= exp(0) = 1, so the
        # guard only ever serves empty rows (numerator 0 -> alpha 0).
        denom = jnp.maximum(denom, 1e-20)
        ad = exd / jnp.take(denom, rows_d, axis=0, mode="clip")
        ah = exh / jnp.take(denom, rows_h, axis=0, mode="clip")
        return ad[None], ah[None]

    sx = P(axis, None)
    s3 = P(axis, None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(sx, sx, sx, sx, s3, s3),
        out_specs=(s3, s3),
        check_vma=False,
    )
    ad, ah = fn(hp.diag_indptr, hp.diag_mask, hp.halo_indptr, hp.halo_mask,
                dl, hl)
    if squeeze:
        ad, ah = ad[..., 0], ah[..., 0]
    return ad, ah


def merge_edge_values(hp: HaloPartition, diag_vals: Array,
                      halo_vals: Array) -> Array:
    """Scatter stacked per-shard edge values back to global CSR edge
    order (the inverse of `halo.split_edge_values`).  Jittable and
    differentiable; mainly for interop/testing — the sharded training
    path composes entirely in the stacked layout."""
    nnz = int(hp.diag_mask.sum() + hp.halo_mask.sum())
    trail = diag_vals.shape[2:]
    out = jnp.zeros((nnz + 1,) + trail, diag_vals.dtype)
    ds = jnp.where(hp.diag_src >= 0, hp.diag_src, nnz).reshape(-1)
    hs = jnp.where(hp.halo_src >= 0, hp.halo_src, nnz).reshape(-1)
    out = out.at[ds].set(diag_vals.reshape((-1,) + trail))
    out = out.at[hs].set(halo_vals.reshape((-1,) + trail))
    return out[:nnz]


def halo_gat_attention(
    hp: HaloPartition,
    feat: Array,
    a_src: Array,
    a_dst: Array,
    mesh: Mesh,
    *,
    axis: str = "data",
    negative_slope: float = 0.2,
) -> Tuple[Array, Array]:
    """Sharded GAT attention weights from projected features.

    ``feat``: (P·cpp, F) row-sharded projected features (square graphs:
    rpp == cpp, one array serves both sides); ``a_src``/``a_dst``: (F,)
    or (F, H) attention vectors (replicated).  Returns softmaxed
    ``(diag_alpha, halo_alpha)`` ready for ``halo_spmm``'s runtime edge
    values.  Composes logits → leaky-relu → softmax exactly like the
    single-device ``ops.graph`` chain.
    """
    if hp.rpp != hp.cpp:
        raise ValueError("halo_gat_attention needs a square partition "
                         f"(rpp={hp.rpp} != cpp={hp.cpp})")
    src_score = feat @ a_src
    dst_score = feat @ a_dst
    dl, hl = halo_additive_logits(hp, src_score, dst_score, mesh, axis=axis)
    dl = jax.nn.leaky_relu(dl, negative_slope)
    hl = jax.nn.leaky_relu(hl, negative_slope)
    return halo_edge_softmax(hp, dl, hl, mesh, axis=axis)
