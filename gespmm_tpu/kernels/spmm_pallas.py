"""Pallas TPU SpMM kernel: chunked row-block gather + MXU scatter-matmul.

TPU-native re-expression of the reference's CUDA kernels (SURVEY §2.2).
Where `spmm_test.cu:104-454` stages 32 nonzeros per warp into shared memory
(Coalesced Row Caching) and reuses them across a wider column tile
(Coarse-grained Warp Merging), this kernel:

  1. walks a precomputed plan of fixed-size nnz *chunks* (E nonzeros each),
     every chunk owned by one *row block* (R output rows) — see
     `sparse/partition.py`;
  2. for each chunk, async-DMAs the E referenced rows of B from HBM into a
     VMEM gather buffer, double-buffered across grid steps so the gather of
     chunk i+1 overlaps the compute of chunk i (the TPU analogue of CRC's
     pipelined shared-memory staging);
  3. reduces the chunk with ONE MXU matmul:  out[R,K] += P[R,E] @ G[E,K],
     where P scatters each slot's edge value to its local row
     (P[r,e] = val_e * [local_row_e == r]) — the entire K tile is amortized
     over one gather, the generalization of CWM's coarsening factor;
  4. accumulates consecutive chunks of the same row block in VMEM (Pallas
     keeps the output block resident while its index map is unchanged),
     zeroing on each block's first chunk.

The grid iterates chunks sequentially ("arbitrary" dimension semantics), so
power-law mega-rows — which span many chunks — are handled with no atomics
and no load imbalance: every grid step is identical work.

Correctness oracle: `ops/reference.spmm_xla` (tested in interpret mode on
CPU and compiled on TPU against scipy goldens).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gespmm_tpu.sparse.partition import SpmmPlan

Array = jax.Array

DEFAULT_K_TILE = 512


def _spmm_kernel(
    # scalar prefetch
    block_ids_ref,  # (C,) SMEM — row block of each chunk
    first_ref,  # (C,) SMEM — 1 iff chunk is first of its block
    # inputs
    cols_cur_ref,  # (1, 1, E) SMEM — column ids, current chunk
    cols_nxt_ref,  # (1, 1, E) SMEM — column ids, next chunk
    local_rows_ref,  # (1, 1, E) VMEM
    vals_ref,  # (1, 1, E) VMEM
    b_hbm_ref,  # (n, K_pad) HBM — gathered manually
    # output
    out_ref,  # (R, K_tile) VMEM — accumulator for current row block
    # scratch
    gather_buf,  # (2, E, K_tile) VMEM
    sems,  # (2,) DMA semaphores
    *,
    rows_per_block: int,
    chunk_nnz: int,
    k_tile: int,
    num_chunks: int,
    mode: str,
):
    # Grid is (n_k, C): chunks iterate FASTEST so the chunk double-buffer
    # pipeline is sequential within each K-tile pass.
    kt = pl.program_id(0)
    c = pl.program_id(1)
    R, E = rows_per_block, chunk_nnz
    k_off = kt * k_tile

    def row_dma(slot, e, col):
        return pltpu.make_async_copy(
            b_hbm_ref.at[pl.ds(col, 1), pl.ds(k_off, k_tile)],
            gather_buf.at[slot, pl.ds(e, 1), :],
            sems.at[slot],
        )

    def start_gather(slot, cols_ref):
        """Issue E row-gather DMAs HBM->VMEM on one slot semaphore."""

        def body(e, _):
            row_dma(slot, e, cols_ref[0, 0, e]).start()
            return _

        jax.lax.fori_loop(0, E, body, 0, unroll=True)

    def wait_gather(slot):
        # DMA semaphores count bytes: one wait shaped like the FULL slot
        # buffer (E rows) drains all E row-copies at once, instead of E
        # scalar waits (which at ~30 cycles each would dominate the chunk).
        pltpu.make_async_copy(
            b_hbm_ref.at[pl.ds(0, E), pl.ds(k_off, k_tile)],
            gather_buf.at[slot],
            sems.at[slot],
        ).wait()

    slot = jax.lax.rem(c, 2)
    nxt_slot = jax.lax.rem(c + 1, 2)

    # Warm-up: on the very first chunk of each K-tile pass, gather "current".
    @pl.when(c == 0)
    def _():
        start_gather(slot, cols_cur_ref)

    # Prefetch next chunk's rows while we compute this one.
    @pl.when(c + 1 < num_chunks)
    def _():
        start_gather(nxt_slot, cols_nxt_ref)

    wait_gather(slot)

    # Build the scatter matrix P[R, E]: val_e routed to local row. Padded
    # slots carry local_row == R (sentinel) and contribute zero.
    lr = local_rows_ref[0, 0, :]  # (E,) int32
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    onehot = (rows_iota == lr[None, :]).astype(jnp.float32)

    def dot(p, g, prec):
        return jax.lax.dot_general(
            p, g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    g_full = gather_buf[slot].astype(jnp.float32)
    if mode == "hilo":
        # One-hot P is EXACT in bf16 (0/1); fold the edge values into the
        # gathered rows (VPU, E*K ops) and split them into two bf16 passes
        # (hi + residual-lo), recovering ~16 mantissa bits at 2/3 the cost
        # of the 3-pass HIGHEST mode.  The one-hot structure means each
        # output element is a plain sum of the selected (hi + lo) pairs, so
        # the error is bounded by the hi/lo representation (~1e-7 relative),
        # NOT by bf16 single-pass rounding (~4e-3).
        p_mat = onehot.astype(jnp.bfloat16)
        g_scaled = g_full * vals_ref[0, 0, :][:, None].astype(jnp.float32)
        g_hi = g_scaled.astype(jnp.bfloat16)
        g_lo = (g_scaled - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        contrib = dot(p_mat, g_hi, jax.lax.Precision.DEFAULT) + dot(
            p_mat, g_lo, jax.lax.Precision.DEFAULT
        )
    else:
        p_mat = onehot * vals_ref[0, 0, :][None, :].astype(jnp.float32)
        prec = (
            jax.lax.Precision.HIGHEST
            if mode == "highest"
            else jax.lax.Precision.DEFAULT
        )
        contrib = dot(p_mat, g_full, prec)

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = contrib.astype(out_ref.dtype)

    @pl.when(first_ref[c] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("m", "k_tile", "interpret", "mode")
)
def _spmm_pallas_call(
    plan: SpmmPlan,
    vals_chunked: Array,
    B: Array,
    m: int,
    k_tile: int,
    interpret: bool = False,
    mode: str = "highest",
) -> Array:
    R, E, C = plan.rows_per_block, plan.chunk_nnz, plan.num_chunks
    n, K = B.shape
    K_pad = _round_up(K, k_tile)
    if K_pad != K:
        B = jnp.pad(B, ((0, 0), (0, K_pad - K)))
    n_k = K_pad // k_tile

    out_dtype = B.dtype
    m_pad = plan.num_blocks * R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ids, first
        grid=(n_k, C),
        in_specs=[
            # Chunk arrays are shaped (C, 1, E) so the (1, 1, E) blocks
            # satisfy the TPU tiling rule (last two block dims equal the
            # array's last two dims).
            # cols (current chunk) — SMEM, scalars drive the DMA gather
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            # cols (next chunk) — SMEM
            pl.BlockSpec(
                (1, 1, E),
                lambda kt, c, blk, fst: (
                    jnp.minimum(c + 1, blk.shape[0] - 1), 0, 0
                ),
                memory_space=pltpu.SMEM,
            ),
            # local_rows — VMEM (vectorized one-hot build)
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # vals — VMEM
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # B stays in HBM; kernel gathers rows itself
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (R, k_tile),
            lambda kt, c, blk, fst: (blk[c], kt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E, k_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _spmm_kernel,
        rows_per_block=R,
        chunk_nnz=E,
        k_tile=k_tile,
        num_chunks=C,
        mode=mode,
    )

    nnz = plan.nnz
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, K_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * R * E * K_pad,
            bytes_accessed=C * E * K_pad * 4 + m_pad * K_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        plan.block_ids,
        plan.first,
        plan.cols.reshape(C, 1, E),
        plan.cols.reshape(C, 1, E),
        plan.local_rows.reshape(C, 1, E),
        vals_chunked.reshape(C, 1, E),
        B,
    )
    return out[:m, :K]


def spmm_pallas(
    plan: SpmmPlan,
    data: Optional[Array],
    B: Array,
    m: int,
    *,
    k_tile: int = DEFAULT_K_TILE,
    interpret: bool = False,
    mode: str = "highest",
) -> Array:
    """Sum-reduce SpMM via the chunked gather kernel.

    ``data``: per-edge values in CSR order, or None for implicit 1.0 (the
    reference's `no_edge_value` family, `spmm_kernel.cu:31-173`).
    ``mode``: scatter-matmul precision — "highest" (exact f32, 3 MXU
    passes), "hilo" (bf16 one-hot + hi/lo value split, 2 passes, ~1e-7
    relative), or "default" (1 bf16 pass, ~4e-3 relative; bench tier only).
    """
    R, E = plan.rows_per_block, plan.chunk_nnz
    if data is None:
        vals_chunked = (plan.local_rows < R).astype(jnp.float32)
    else:
        vals_chunked = plan.chunk_data(data).astype(jnp.float32)
    k_tile = min(k_tile, _round_up(B.shape[1], 128))
    return _spmm_pallas_call(
        plan, vals_chunked, B, m, k_tile, interpret, mode
    )
