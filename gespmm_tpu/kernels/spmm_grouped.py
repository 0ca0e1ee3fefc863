"""Grouped-gather Pallas SpMM: deduplicated row-group DMA + MXU reduction.

The locality-aware fast path (pairs with `sparse/reorder.py`).  The per-row
gather kernel (spmm_pallas.py) is bound by DMA descriptor issue (~25-35ns
per descriptor regardless of payload below ~4KB — measured on v5e).  This
kernel cuts the descriptor count by the graph's group-dedup factor:

  1. each chunk gathers its DISTINCT aligned G-row groups of B (one DMA per
     group, G·K_tile·4 bytes) into a staged buffer — on an RCM-reordered
     graph a group serves ~2+ edges;
  2. the reduction becomes a triple product
         out[R,K] += (P[R,E] @ Q[E,S]) @ staged[S,K]
     with P the (local-row x edge) value scatter and Q the 0/1 (edge x
     staged-slot) selector, both built on the VPU from broadcasted iota
     compares — all FLOPs on the MXU, no per-edge scalar work;
  3. f32 exactness at bf16 speed via operand splitting: for binary
     adjacency (the reference benchmark case, values forced to 1 at
     `spmm_test.cu:574`) M = P@Q is exactly representable in bf16, and the
     staged f32 rows are split into 3 bf16 terms (hi/lo/lo2), so the main
     matmul runs as 3 single-pass bf16 MXU products accumulated in f32 —
     2x cheaper than the compiler's 6-pass HIGHEST mode at the same 1e-6
     accuracy.  Valued adjacency uses HIGHEST (exact, slower).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gespmm_tpu.sparse.partition import GroupedSpmmPlan

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grouped_kernel(
    # scalar prefetch
    block_ids_ref,  # (C,) SMEM
    first_ref,  # (C,) SMEM
    # inputs
    grp_cur_ref,  # (1, 1, NG) SMEM
    grp_nxt_ref,  # (1, 1, NG) SMEM
    slots_ref,  # (1, 1, E) VMEM
    local_rows_ref,  # (1, 1, E) VMEM
    vals_ref,  # (1, 1, E) VMEM (all-ones for binary)
    b_hbm_ref,  # (n_pad, K_pad) HBM
    out_ref,  # (R, k_tile) VMEM
    staged,  # (2, S, k_tile) VMEM, S = NG*G
    sems,  # (2,) DMA
    *,
    rows_per_block: int,
    edges_per_chunk: int,
    groups_per_chunk: int,
    group_rows: int,
    k_tile: int,
    num_chunks: int,
    binary: bool,
):
    kt = pl.program_id(0)
    c = pl.program_id(1)
    R, E, NG, G = rows_per_block, edges_per_chunk, groups_per_chunk, group_rows
    S = NG * G
    k_off = kt * k_tile

    def start_gather(slot, gref):
        def body(g, _):
            gid = gref[0, 0, g]
            pltpu.make_async_copy(
                b_hbm_ref.at[pl.ds(gid * G, G), pl.ds(k_off, k_tile)],
                staged.at[slot, pl.ds(g * G, G), :],
                sems.at[slot],
            ).start()
            return _

        jax.lax.fori_loop(0, NG, body, 0, unroll=True)

    def wait_gather(slot):
        # One byte-count wait shaped like the whole staged slot (NG copies
        # of G rows each).
        pltpu.make_async_copy(
            b_hbm_ref.at[pl.ds(0, S), pl.ds(k_off, k_tile)],
            staged.at[slot],
            sems.at[slot],
        ).wait()

    slot = jax.lax.rem(c, 2)
    nxt_slot = jax.lax.rem(c + 1, 2)

    @pl.when(c == 0)
    def _():
        start_gather(slot, grp_cur_ref)

    @pl.when(c + 1 < num_chunks)
    def _():
        start_gather(nxt_slot, grp_nxt_ref)

    wait_gather(slot)

    # P[R, E]: edge value routed to its local row (pad rows -> sentinel R,
    # contributing nothing).  Q[E, S]: 0/1 edge -> staged slot selector.
    lr = local_rows_ref[0, 0, :]
    sl = slots_ref[0, 0, :]
    p_mat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (R, E), 0) == lr[None, :],
        vals_ref[0, 0, :][None, :].astype(jnp.float32),
        0.0,
    )
    q_mat = (
        jax.lax.broadcasted_iota(jnp.int32, (E, S), 1) == sl[:, None]
    ).astype(jnp.float32)

    if binary:
        # P, Q are 0/1: M exact in one bf16 pass.
        m_mat = jax.lax.dot_general(
            p_mat.astype(jnp.bfloat16),
            q_mat.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Split staged f32 rows into 3 bf16 terms: exact to ~2^-24.
        st = staged[slot]
        hi = st.astype(jnp.bfloat16)
        r1 = st - hi.astype(jnp.float32)
        lo = r1.astype(jnp.bfloat16)
        lo2 = (r1 - lo.astype(jnp.float32)).astype(jnp.bfloat16)
        mb = m_mat.astype(jnp.bfloat16)  # exact: 0/1 entries

        def mm(a, b):
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        contrib = mm(mb, hi) + mm(mb, lo) + mm(mb, lo2)
    else:
        m_mat = jax.lax.dot_general(
            p_mat, q_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        contrib = jax.lax.dot_general(
            m_mat, staged[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = contrib.astype(out_ref.dtype)

    @pl.when(first_ref[c] == 0)
    def _():
        out_ref[:] = out_ref[:] + contrib.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("m", "k_tile", "binary", "interpret")
)
def _grouped_call(
    plan: GroupedSpmmPlan,
    vals_chunked: Array,
    B: Array,
    m: int,
    k_tile: int,
    binary: bool,
    interpret: bool = False,
) -> Array:
    R, E = plan.rows_per_block, plan.edges_per_chunk
    NG, G = plan.groups_per_chunk, plan.group_rows
    C = plan.num_chunks
    S = NG * G
    n, K = B.shape
    K_pad = _round_up(K, k_tile)
    # Pad rows so that any aligned group [g*G, (g+1)*G) is in bounds.
    n_pad = _round_up(n, G)
    if K_pad != K or n_pad != n:
        B = jnp.pad(B, ((0, n_pad - n), (0, K_pad - K)))
    n_k = K_pad // k_tile
    m_pad = plan.num_blocks * R

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_k, C),
        in_specs=[
            pl.BlockSpec(
                (1, 1, NG), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, NG),
                lambda kt, c, blk, fst: (
                    jnp.minimum(c + 1, blk.shape[0] - 1), 0, 0
                ),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, E), lambda kt, c, blk, fst: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (R, k_tile),
            lambda kt, c, blk, fst: (blk[c], kt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S, k_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _grouped_kernel,
        rows_per_block=R,
        edges_per_chunk=E,
        groups_per_chunk=NG,
        group_rows=G,
        k_tile=k_tile,
        num_chunks=C,
        binary=binary,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, K_pad), B.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * (R * E * S + 3 * R * S * K_pad),
            bytes_accessed=C * S * K_pad * 4 + m_pad * K_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        plan.block_ids,
        plan.first,
        plan.groups.reshape(C, 1, NG),
        plan.groups.reshape(C, 1, NG),
        plan.slots.reshape(C, 1, E),
        plan.local_rows.reshape(C, 1, E),
        vals_chunked.reshape(C, 1, E),
        B,
    )
    return out[:m, :K]


def spmm_grouped(
    plan: GroupedSpmmPlan,
    data: Optional[Array],
    B: Array,
    m: int,
    *,
    k_tile: int = 512,
    interpret: bool = False,
) -> Array:
    """Sum-reduce SpMM via the grouped-gather kernel."""
    R = plan.rows_per_block
    binary = data is None
    if data is None:
        vals_chunked = (plan.local_rows < R).astype(jnp.float32)
    else:
        vals_chunked = plan.chunk_data(data).astype(jnp.float32)
    k_tile = min(k_tile, _round_up(B.shape[1], 128))
    return _grouped_call(
        plan, vals_chunked, B, m, k_tile, binary, interpret
    )
