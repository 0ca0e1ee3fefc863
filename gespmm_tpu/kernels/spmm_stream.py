"""Stream-reduce SpMM: tiled XLA gather + Pallas VMEM-resident reduction.

The second-generation TPU SpMM (the "v2" of `spmm_pallas.py`), built from
measured v5e behavior rather than translated GPU structure:

  * Scattered per-edge row fetches from an HBM-resident dense operand are
    descriptor-issue-bound (~10ns/row) no matter who issues them (XLA
    gather or hand-rolled per-row DMA).  But XLA's `take` from a table that
    fits VMEM runs at ~0.4-2.2ns/row.  So the dense operand is gathered
    **per column tile** (each tile VMEM-sized), which needs edges sorted by
    (tile, row) — the host plan in `sparse/partition.build_tiled_plan`.

  * `jax.ops.segment_sum` / scatter-add measured ~10.7ns/edge — slower
    than the gather it reduces.  The reduction here is instead a Pallas
    kernel: the gathered contribution stream is consumed at full HBM
    bandwidth in chunks of E slots, and each chunk is folded into a
    **VMEM-resident** output accumulator with one MXU scatter-matmul
    out[rs:rs+R] += onehot(local_rows) @ contrib_chunk.  Output rows are
    split into parts sized so the accumulator fits VMEM (~64MB budget of
    the ~128MB on v5e), the TPU analogue of the reference's row-per-warp
    ownership (`spmm_test.cu:104-159`) — each part owns its reduction, no
    atomics.

  * Numerics: the one-hot matrix is exact in bf16; the contribution chunk
    is split into bf16 mantissa chunks for the MXU passes.  Default mode
    "trilo" (3 chunks) recovers full f32 values — result matches f32
    accumulation to roundoff at half HIGHEST's MXU cost; "hilo" (2 chunks,
    ~1e-5 relative, grows with row degree) and "fast" (1 pass, ~4e-3) are
    the speed tiers.

Reference parity: this is the edge-valued + binary SpMM kernel family
(`spmm_test.cu:64-454`, `spmm_kernel.cu:31-173`) re-designed TPU-first;
CRC's shared-memory staging becomes the VMEM-resident gather tile, CWM's
accumulator widening becomes the K-tile dimension of the resident output.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gespmm_tpu.sparse.partition import TiledPartPlan, TiledSpmmPlan

Array = jax.Array


def _round_up(x: int, a: int) -> int:
    return -(-x // a) * a


def _reduce_kernel(
    row_start_ref,  # (C,) SMEM scalar-prefetch
    local_rows_ref,  # (G, 1, E) VMEM
    contrib_ref,  # (G*E, k_tile) VMEM (streamed)
    out_ref,  # (m_pad, k_tile) VMEM-resident accumulator
    *,
    rows_per_block: int,
    mode: str,
    group: int,
):
    kt, cg = pl.program_id(0), pl.program_id(1)
    R = rows_per_block

    @pl.when(cg == 0)
    def _():
        # Zero in row-slices: a whole-buffer assignment materializes a
        # second accumulator-sized temporary on the VMEM stack, which
        # blows the scoped limit once m_pad*k_tile*4 exceeds ~half of it.
        m_pad, ktile = out_ref.shape
        z = min(m_pad, 4096)
        zeros = jnp.zeros((z, ktile), out_ref.dtype)
        for r0 in range(0, m_pad, z):
            rows = min(z, m_pad - r0)
            out_ref[r0 : r0 + rows, :] = zeros[:rows]

    def dot(p, g):
        return jax.lax.dot_general(
            p, g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # `group` chunks per grid step amortize the pipeline's fixed per-step
    # cost (~1us measured), which dominates small graphs.
    for i in range(group):
        lr = local_rows_ref[i, 0, :]  # (E,)
        E = lr.shape[0]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
        onehot = rows_iota == lr[None, :]
        g32 = contrib_ref[i * E : (i + 1) * E, :].astype(jnp.float32)
        if mode == "trilo":
            # Three bf16 passes (hi + mid + lo mantissa chunks) recover
            # the full f32 value of every contribution; with the exact
            # 0/1 bf16 one-hot, the result matches f32 accumulation to
            # roundoff — at 3 bf16 MXU passes instead of HIGHEST's ~6.
            p = onehot.astype(jnp.bfloat16)
            hi = g32.astype(jnp.bfloat16)
            r1 = g32 - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = dot(p, hi) + dot(p, mid) + dot(p, lo)
        elif mode == "hilo":
            p = onehot.astype(jnp.bfloat16)
            hi = g32.astype(jnp.bfloat16)
            lo = (g32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = dot(p, hi) + dot(p, lo)
        elif mode == "fast":
            acc = dot(
                onehot.astype(jnp.bfloat16), g32.astype(jnp.bfloat16)
            )
        else:  # highest
            acc = jax.lax.dot_general(
                onehot.astype(jnp.float32), g32,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        rs = pl.multiple_of(row_start_ref[cg * group + i], 8)
        out_ref[pl.ds(rs, R), :] += acc


@functools.partial(
    jax.jit, static_argnames=("m_pad", "rows_per_block", "k_tile",
                              "mode", "interpret")
)
def _reduce_part(
    contrib: Array,  # (S, K_pad)
    local_rows: Array,  # (C, E)
    row_start: Array,  # (C,)
    m_pad: int,
    rows_per_block: int,
    k_tile: int,
    mode: str,
    interpret: bool,
) -> Array:
    C, E = local_rows.shape
    K_pad = contrib.shape[1]
    n_k = K_pad // k_tile
    G = 4 if C % 4 == 0 else 1  # plans pad C to CHUNK_GROUP

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_start
        grid=(n_k, C // G),
        in_specs=[
            pl.BlockSpec((G, 1, E), lambda kt, cg, rs: (cg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * E, k_tile), lambda kt, cg, rs: (cg, kt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m_pad, k_tile), lambda kt, cg, rs: (0, kt),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _reduce_kernel, rows_per_block=rows_per_block, mode=mode, group=G
    )
    passes = {"highest": 6, "trilo": 3, "hilo": 2}.get(mode, 1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, K_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # The resident accumulator (m_pad x k_tile) plus streamed chunk
            # buffers exceed the 16MB default scoped-vmem limit; v5e has
            # 128MB physical VMEM.
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * rows_per_block * E * K_pad * passes,
            bytes_accessed=C * E * K_pad * 4 + m_pad * K_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(row_start, local_rows.reshape(C, 1, E), contrib)


def _gather_part(
    part: TiledPartPlan,
    data: Optional[Array],
    B: Array,
) -> Array:
    """XLA gather phase: per column tile, take rows of a VMEM-sized slice
    of B; scale by edge values while still in registers."""
    vals = None
    if data is not None:
        vals = jnp.take(data, part.src, axis=0)
    pieces = []
    for col0, ncols, slot0, slot1 in part.tile_slices:
        tile = B[col0 : col0 + ncols]
        g = jnp.take(tile, part.lcols[slot0:slot1], axis=0)
        if vals is not None:
            g = g * vals[slot0:slot1, None].astype(g.dtype)
        pieces.append(g)
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)


def spmm_tiled(
    plan: TiledSpmmPlan,
    data: Optional[Array],
    B: Array,
    m: int,
    *,
    k_tile: int = 512,
    mode: str = "trilo",
    interpret: Optional[bool] = None,
) -> Array:
    """Sum-reduce SpMM via tiled gather + streaming VMEM reduction.

    ``data``: per-edge values in CSR order, or None for implicit 1.0.
    Output dtype follows B (accumulation is always f32).
    ``mode``: "trilo" (default, f32-grade) | "hilo" | "highest" | "fast".
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, K = B.shape
    # bf16 inputs with implicit-1.0 edges: one bf16 MXU pass is EXACT
    # (the contributions already carry no more than bf16 precision), and
    # the gathered stream halves its HBM traffic.
    if B.dtype == jnp.bfloat16 and data is None:
        Bc, mode = B, "fast"
    else:
        Bc = B.astype(jnp.float32)
    # Max K per pass, capped so the resident accumulator (m_pad x kt x
    # 4B) stays within ~64MB of VMEM for the largest part (streamed chunk
    # buffers and the scoped limit take the rest of the 128MB on v5e).
    m_pad_max = max(p.m_pad for p in plan.parts)
    budget_rows = (64 * 1024 * 1024) // max(m_pad_max * 4, 1)
    kt_max = min(k_tile, max(128, (budget_rows // 128) * 128))
    if K <= kt_max:
        # Single pass at the exact width — Pallas allows a block dim equal
        # to the full array dim, so narrow K (e.g. 32) needs NO padding.
        K_pad = K
    else:
        K_pad = _round_up(K, 128)
        if K_pad != K:
            Bc = jnp.pad(Bc, ((0, 0), (0, K_pad - K)))

    outs = []
    for part in plan.parts:
        kt = min(kt_max, K_pad)
        while K_pad % kt:
            kt -= 128
        contrib = _gather_part(part, data, Bc)
        out_p = _reduce_part(
            contrib,
            part.local_rows,
            part.row_start,
            part.m_pad,
            part.rows_per_block,
            kt,
            mode,
            interpret,
        )
        outs.append(out_p[: part.m_part])
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
    return out[:m, :K].astype(B.dtype)


def sddmm_tiled(
    plan: TiledSpmmPlan,
    D1: Array,
    D2: Array,
) -> Array:
    """SDDMM over the stream plan's slot layout: out[e] = D1[row_e]·D2[col_e].

    Pure XLA — both gathers hit VMEM-sized tables (D1 sliced per row part,
    D2 per column tile), sidestepping the ~10ns/row HBM descriptor wall of
    the naive two-gather formulation (`ops/reference.sddmm_xla`); the
    per-edge K-reduction streams on the VPU.  Returns CSR-ordered edge
    values (the slot->edge permutation is scattered back at scalar width).
    """
    nnz = plan.nnz
    K = D1.shape[1]
    acc = jnp.promote_types(D1.dtype, jnp.float32)
    out = jnp.zeros((nnz + 1,), acc)
    for part in plan.parts:
        R, E = part.rows_per_block, part.chunk_nnz
        D1p = D1[part.row0 : part.row0 + part.m_part]
        if D1p.shape[0] < part.m_pad:
            D1p = jnp.pad(D1p, ((0, part.m_pad - D1p.shape[0]), (0, 0)))
        rows_slot = (
            part.row_start[:, None] + part.local_rows
        ).reshape(-1)
        rows_slot = jnp.minimum(rows_slot, part.m_pad - 1)
        d1 = jnp.take(D1p, rows_slot, axis=0).astype(acc)
        pieces = []
        for col0, ncols, s0, s1 in part.tile_slices:
            pieces.append(
                jnp.take(D2[col0 : col0 + ncols], part.lcols[s0:s1], axis=0)
            )
        g2 = (
            pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 0)
        ).astype(acc)
        prod = jnp.sum(d1 * g2, axis=-1)
        valid = (part.local_rows < R).reshape(-1)
        dst = jnp.where(valid, part.src, nnz)
        out = out.at[dst].set(prod)
    return out[:nnz].astype(D1.dtype)
