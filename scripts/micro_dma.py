#!/usr/bin/env python
"""Probe the TPU's scattered-row DMA gather limits from Pallas.

Questions:
  1. ns/row for per-row HBM->VMEM DMA, vs chunk size E and semaphore count S.
  2. does a deeper in-flight window help?
  3. XLA take() with sorted vs unsorted indices (is sortedness the lever?)
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from gespmm_tpu.utils import timing


def gather_kernel(cols_ref, b_hbm, out_ref, buf, sems, *, E, S, K):
    """One grid step: DMA-gather E rows into buf, round-robin over S sems,
    reduce-sum into out (to consume the data)."""
    c = pl.program_id(0)

    def issue(e, _):
        slot = jax.lax.rem(e, S)
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(cols_ref[0, 0, e], 1), :],
            buf.at[slot, pl.ds(jax.lax.div(e, S), 1), :],
            sems.at[slot],
        ).start()
        return _

    jax.lax.fori_loop(0, E, issue, 0, unroll=(E <= 256))
    rows_per_sem = E // S

    def drain(s, acc):
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(0, rows_per_sem), :],
            buf.at[s],
            sems.at[s],
        ).wait()
        return acc + jnp.sum(buf[s], axis=0, keepdims=True)

    acc = jax.lax.fori_loop(
        0, S, drain, jnp.zeros((1, K), jnp.float32), unroll=True
    )

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def dma_gather(cols, B, E, S):
    (nnz,) = cols.shape
    n, K = B.shape
    C = nnz // E
    cols2 = cols[: C * E].reshape(C, 1, E)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 1, E), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, K), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, E // S, K), jnp.float32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(gather_kernel, E=E, S=S, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(cols2, B)


def main():
    n, K = 262144, 128
    nnz = 1 << 21  # 2M random rows
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, K)).astype(np.float32))
    cols_rand = jnp.asarray(rng.integers(0, n, size=nnz).astype(np.int32))
    cols_sorted = jnp.sort(cols_rand)

    for E in (128, 512, 2048):
        for S in (1, 2, 4, 8):
            if E // S < 1:
                continue
            f = jax.jit(functools.partial(dma_gather, E=E, S=S))
            # chain via adding tiny output back into B's first row? simpler:
            # rely on same-shape chaining of B
            def step(b, f=f):
                out = f(cols_rand, b)
                return b + out * 1e-12  # data dependency, negligible cost

            r = timing.benchmark_chained(step, B, iters=10, groups=3)
            ns_row = r.best_s / nnz * 1e9
            bw = nnz * K * 4 / r.best_s / 1e9
            print(
                f"  pallas dma E={E:5d} S={S}: {r.best_s*1e3:8.2f} ms "
                f"{ns_row:6.2f} ns/row {bw:7.1f} GB/s",
                flush=True,
            )

    for name, cols, srt in (
        ("take unsorted", cols_rand, False),
        ("take sorted", cols_sorted, True),
    ):
        def step(b, cols=cols, srt=srt):
            g = jnp.take(b, cols, axis=0, indices_are_sorted=srt)
            return b + jnp.sum(g, axis=0, keepdims=True) * 1e-12

        r = timing.benchmark_chained(step, B, iters=10, groups=3)
        ns_row = r.best_s / nnz * 1e9
        bw = nnz * K * 4 / r.best_s / 1e9
        print(
            f"  {name:22s}: {r.best_s*1e3:8.2f} ms {ns_row:6.2f} ns/row "
            f"{bw:7.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
