"""Pallas TPU SDDMM kernel: edge-chunk gather + VPU dot.

TPU-native re-expression of `pytorch-custom/sddmm.cu` (SURVEY §2.2.4).
Where the CUDA kernel assigns 4 edges per warp, vectorizes the K-loop with
float4 loads, and tree-reduces with `__shfl_xor_sync`, this kernel:

  1. walks fixed-size chunks of E edges (edge-parallel, like the COO CUDA
     variant; the CSR entry point expands indptr to row ids up front instead
     of the per-edge binary search `findRow`, `computeUtil.h:11-28`);
  2. async-DMAs the E referenced rows of BOTH dense operands into VMEM
     (double-buffered across grid steps);
  3. computes all E dots at once on the VPU: elementwise product of two
     (E, K) tiles and a lane reduction — K vectorization and the warp
     reduction collapse into one vector op;
  4. writes the (1, E) result lane-aligned.

The nnz%16 "tail block" special-casing of the CUDA code (`sddmm.cu:53-87`)
becomes plain padding: edges are padded to a multiple of E and the pad lanes
are sliced off on the host side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EDGE_CHUNK = 128  # E: lane width of the output tile
MAX_K_PAD = 1024  # beyond this VMEM budget the dispatcher uses the XLA path


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sddmm_kernel(
    rows_cur_ref,  # (1, 1, E) SMEM
    rows_nxt_ref,  # (1, 1, E) SMEM
    cols_cur_ref,  # (1, 1, E) SMEM
    cols_nxt_ref,  # (1, 1, E) SMEM
    d1_hbm_ref,  # (m, K_pad) HBM
    d2_hbm_ref,  # (n, K_pad) HBM
    out_ref,  # (1, 1, E) VMEM
    buf1,  # (2, E, K_pad) VMEM
    buf2,  # (2, E, K_pad) VMEM
    sems,  # (2, 2) DMA semaphores
    *,
    chunk: int,
    num_chunks: int,
):
    c = pl.program_id(0)
    E = chunk

    def edge_dma(which, slot, e, idx):
        src = d1_hbm_ref if which == 0 else d2_hbm_ref
        buf = buf1 if which == 0 else buf2
        return pltpu.make_async_copy(
            src.at[pl.ds(idx, 1), :],
            buf.at[slot, pl.ds(e, 1), :],
            sems.at[slot, which],
        )

    def start_gather(slot, rows_ref, cols_ref):
        def body(e, _):
            edge_dma(0, slot, e, rows_ref[0, 0, e]).start()
            edge_dma(1, slot, e, cols_ref[0, 0, e]).start()
            return _

        jax.lax.fori_loop(0, E, body, 0, unroll=True)

    def wait_gather(slot):
        # DMA semaphores count bytes: one full-buffer-shaped wait per
        # operand drains all E row-copies on that semaphore at once.
        pltpu.make_async_copy(
            d1_hbm_ref.at[pl.ds(0, E), :], buf1.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            d2_hbm_ref.at[pl.ds(0, E), :], buf2.at[slot], sems.at[slot, 1]
        ).wait()

    slot = jax.lax.rem(c, 2)
    nxt = jax.lax.rem(c + 1, 2)

    @pl.when(c == 0)
    def _():
        start_gather(slot, rows_cur_ref, cols_cur_ref)

    @pl.when(c + 1 < num_chunks)
    def _():
        start_gather(nxt, rows_nxt_ref, cols_nxt_ref)

    wait_gather(slot)

    prod = buf1[slot].astype(jnp.float32) * buf2[slot].astype(jnp.float32)
    dots = jnp.sum(prod, axis=1)  # (E,) fp32 accumulation
    out_ref[0, 0, :] = dots.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sddmm_pallas_call(rows_p, cols_p, D1, D2, interpret=False):
    # Chunk index arrays come in as (C, 1, E): the (1, 1, E) blocks then
    # satisfy the TPU tiling rule (last two block dims == array dims).
    C, _, E = rows_p.shape
    K_pad = D1.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, E), lambda c: (c, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, E), lambda c: (jnp.minimum(c + 1, C - 1), 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, E), lambda c: (c, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, E), lambda c: (jnp.minimum(c + 1, C - 1), 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, E), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, E, K_pad), jnp.float32),
            pltpu.VMEM((2, E, K_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_sddmm_kernel, chunk=E, num_chunks=C)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, 1, E), D1.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * E * K_pad,
            bytes_accessed=2 * C * E * K_pad * 4 + C * E * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows_p, rows_p, cols_p, cols_p, D1, D2)
    return out


def sddmm_pallas(
    rows: Array,
    cols: Array,
    D1: Array,
    D2: Array,
    *,
    chunk: int = EDGE_CHUNK,
    interpret: bool = False,
) -> Array:
    """out[e] = D1[rows[e]] · D2[cols[e]] — per-edge values, fp32 accumulate."""
    nnz = rows.shape[0]
    K = D1.shape[1]
    K_pad = _round_up(K, 128)
    if K_pad > MAX_K_PAD:
        from gespmm_tpu.ops.reference import sddmm_xla

        return sddmm_xla(rows, cols, D1, D2)
    if K_pad != K:
        D1 = jnp.pad(D1, ((0, 0), (0, K_pad - K)))
        D2 = jnp.pad(D2, ((0, 0), (0, K_pad - K)))
    nnz_pad = _round_up(max(nnz, 1), chunk)
    C = nnz_pad // chunk
    rows_p = jnp.pad(rows, (0, nnz_pad - nnz)).reshape(C, 1, chunk)
    cols_p = jnp.pad(cols, (0, nnz_pad - nnz)).reshape(C, 1, chunk)
    out = _sddmm_pallas_call(rows_p, cols_p, D1, D2, interpret=interpret)
    return out.reshape(-1)[:nnz]
