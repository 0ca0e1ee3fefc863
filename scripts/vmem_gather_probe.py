#!/usr/bin/env python
"""Measure per-row gather cost from a VMEM-resident tile inside a Pallas
kernel, vs the known ~10ns/row HBM descriptor wall.  Decides whether the
multi-tile stream SpMM can fuse its gather into the reduce kernel."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from gespmm_tpu.utils import timing

T = 16384   # tile rows
KT = 128
E = 256     # rows gathered per grid step
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def kern_dma(idx_ref, tile_ref, out_ref, scratch, sem, *, src_vmem):
    c = pl.program_id(0)

    def body(e, _):
        pltpu.make_async_copy(
            tile_ref.at[pl.ds(idx_ref[c * E + e], 1), :],
            scratch.at[pl.ds(e, 1), :],
            sem,
        ).start()
        return _

    jax.lax.fori_loop(0, E, body, 0, unroll=True)
    pltpu.make_async_copy(
        tile_ref.at[pl.ds(0, E), :], scratch, sem
    ).wait()
    out_ref[:] = out_ref[:] + jnp.sum(
        scratch[:].reshape(E // 8, 8, KT), axis=0
    )


def kern_dyn(idx_ref, tile_ref, out_ref, *, src_vmem):
    c = pl.program_id(0)

    def body(e, acc):
        row = tile_ref[pl.ds(idx_ref[c * E + e], 1), :]
        return acc + row

    acc = jax.lax.fori_loop(
        0, E, body, jnp.zeros((1, KT), jnp.float32), unroll=8
    )
    out_ref[:] = out_ref[:] + acc


def run(kind, src_vmem):
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, T, size=(C * E,)).astype(np.int32)
    )
    tile = jnp.asarray(
        np.random.default_rng(1).standard_normal((T, KT)).astype(np.float32)
    )
    space = pltpu.VMEM if src_vmem else pl.ANY
    if kind == "dma":
        kernel = functools.partial(kern_dma, src_vmem=src_vmem)
        out_shape = jax.ShapeDtypeStruct((8, KT), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec(memory_space=space)],
            out_specs=pl.BlockSpec((8, KT), lambda c, i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((E, KT), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
    else:
        if not src_vmem:
            return None
        kernel = functools.partial(kern_dyn, src_vmem=src_vmem)
        out_shape = jax.ShapeDtypeStruct((1, KT), jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[pl.BlockSpec(memory_space=space)],
            out_specs=pl.BlockSpec((1, KT), lambda c, i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )

    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def chained(x):
        return f(idx, x)[0:1, :] * 0.0 + x[0:1, :] + 1.0

    # chain via the tile so iterations are data-dependent
    def step(x):
        r = f(idx, x)
        return x + r[0:1, :] * 1e-30

    r = timing.benchmark_chained(step, tile, iters=3, groups=2)
    ns_per_row = r.median_s / (C * E) * 1e9
    print(f"{kind:4s} src={'VMEM' if src_vmem else 'HBM '}: "
          f"{r.median_s*1e3:8.2f} ms  {ns_per_row:6.2f} ns/row", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "dma_vmem"):
    run("dma", True)
if which in ("all", "dma_hbm"):
    run("dma", False)
if which in ("all", "dyn"):
    run("dyn", True)
