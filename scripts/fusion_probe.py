#!/usr/bin/env python
"""Probe: can allow_input_fusion fuse the XLA gather into the reduce
kernel's operand pipeline (eliminating the contrib HBM roundtrip)?"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import gespmm_tpu.kernels.spmm_stream as ss
from gespmm_tpu.ops.spmm import Adjacency, spmm
from gespmm_tpu.utils import timing
from gespmm_tpu.utils.datasets import rmat_graph


def patched_reduce(fuse):
    orig = ss._reduce_part

    @functools.partial(
        jax.jit,
        static_argnames=("m_pad", "rows_per_block", "k_tile", "mode",
                         "interpret"),
    )
    def rp(contrib, local_rows, row_start, m_pad, rows_per_block, k_tile,
           mode, interpret):
        C, E = local_rows.shape
        K_pad = contrib.shape[1]
        n_k = K_pad // k_tile
        G = 4 if C % 4 == 0 else 1
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
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
            ss._reduce_kernel, rows_per_block=rows_per_block, mode=mode,
            group=G,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m_pad, K_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=112 * 1024 * 1024,
                allow_input_fusion=[False, True] if fuse else None,
            ),
            interpret=interpret,
        )(row_start, local_rows.reshape(C, 1, E), contrib)

    return rp


def main():
    csr = rmat_graph(scale=18, edge_factor=8, seed=0)
    adj = Adjacency.from_csr(csr, plan="tiled")
    n = csr.shape[1]
    B = jnp.asarray(
        (np.random.default_rng(0).standard_normal((n, 128)) * 0.01)
        .astype(np.float32)
    )
    flops = 2.0 * csr.nnz * 128
    orig = ss._reduce_part
    for fuse in (False, True):
        ss._reduce_part = patched_reduce(fuse)
        try:
            f = jax.jit(lambda x: spmm(adj, x, method="tiled") * 0.5)
            out = f(B)
            r = timing.benchmark_chained(f, B, iters=10, groups=3)
            print(f"fuse={fuse}: {r.median_s*1e3:8.2f} ms "
                  f"{flops/r.median_s/1e9:6.1f} GF/s", flush=True)
        except Exception as e:
            print(f"fuse={fuse}: FAIL {str(e)[:200]}", flush=True)
        finally:
            ss._reduce_part = orig


if __name__ == "__main__":
    main()
