#!/usr/bin/env python
"""Probe: can the stream-SpMM's gather be FUSED into the reduce kernel?

VERDICT r4 #1 asks either for a fused kernel (B column tile VMEM-resident
inside the Pallas kernel, slots consumed without the HBM round-trip of
the materialized contribution stream) or for a committed probe
demonstrating the Mosaic limitation plus a re-derived large-K target.
This is that probe.  Run on the TPU:  python scripts/fused_gather_probe.py

Three candidate in-kernel gather mechanisms are tested:

A. `tpu.dynamic_gather` along sublanes (jnp.take_along_axis(tbl, idx, 0)
   inside the kernel).  Mosaic's lowering (jax/_src/pallas/mosaic/
   lowering.py::_gather_lowering_rule) requires table == indices ==
   output shape AND the gather dimension to fit ONE vreg: compiling any
   f32 table taller than 8 sublanes fails with "Not implemented:
   Multiple source vregs along gather dimension".  An 8-row B tile is
   useless as a column tile — candidate A is structurally out.

B. `tpu.dynamic_gather` along lanes (axis=1, table transposed): the same
   one-vreg constraint caps the gather dimension at 128 lanes.  A
   128-column tile is measurable but forces the plan into the narrow-
   tile regime of (D) — candidate B is bounded by the same economics.

C. One-hot MXU gather: contrib = onehot(idx, ncols) @ B_tile per chunk.
   Always compiles; cost is passes * 2*ncols*K flops per slot, LINEAR in
   the tile width.  Measured here at several ncols so the model is
   calibrated, not guessed.

D. The economics: (C) is affordable only at ncols <= ~512 (at K=512 a
   single bf16 pass costs 2*512*512 = 0.52 MF/slot = ~2.9 ns at the
   measured 181 TF/s; the stream round-trip it replaces costs ~5.2 ns +
   ~2-3 ns gather issue).  But the tiled plan's chunk fill is set by the
   JOINT (row-window, column-tile) density: narrowing col_tile from 8192
   to 512 divides edges-per-row-per-tile by 16, and the slot padding
   measured below explodes accordingly.  The padding multiplies EVERY
   per-slot cost (gather flops, scatter flops) and erases the stream
   saving many times over.

Conclusion (see the printed summary): on v5e Mosaic the gather cannot be
fused profitably for power-law graphs; the two-phase design's
materialized-stream bound (`spmm_stream_roofline`) is the defensible
large-K target.  The one lever that works — materializing the stream in
bf16 — shipped in round 4 (mode="fast").

Also relevant (measured in sibling probes): per-row DMA from a VMEM
source deadlocks, and per-row DMA from HBM is descriptor-bound at
~10 ns/row (scripts/micro_dma.py).
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gespmm_tpu.utils import timing  # noqa: E402


# ---------------------------------------------------------------------------
# A/B: tpu.dynamic_gather compile probes
# ---------------------------------------------------------------------------


def _try_dynamic_gather(T: int, K: int, axis: int) -> str:
    """Compile a kernel gathering a (T, K) f32 block along `axis`.
    Returns 'OK' or the first line of the compile error."""

    L = T if axis == 0 else K

    def kern(idx_ref, tbl_ref, out_ref):
        iv = idx_ref[0, 0, :]
        if axis == 0:
            idx = jnp.broadcast_to(iv[:, None], (T, K))
        else:
            idx = jnp.broadcast_to(iv[None, :], (T, K))
        g = jnp.take_along_axis(tbl_ref[:], idx, axis=axis)
        out_ref[:] = g[:8, :]

    f = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, 1, L), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
    )
    idx = jnp.zeros((1, 1, L), jnp.int32)
    tbl = jnp.ones((T, K), jnp.float32)
    try:
        jax.jit(f)(idx, tbl).block_until_ready()
        return "OK"
    except Exception as e:  # noqa: BLE001 — we want the compiler's message
        msg = str(e)
        for key in ("Not implemented:", "NotImplementedError:", "Error:"):
            if key in msg:
                return key + msg.split(key, 1)[1].splitlines()[0]
        return msg.splitlines()[0][:120]


# ---------------------------------------------------------------------------
# C: one-hot MXU gather throughput
# ---------------------------------------------------------------------------


def _onehot_gather_kernel(s_ref, idx_ref, tbl_ref, out_ref, *, E, NC, K):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iv = idx_ref[0, 0, :] + s_ref[0]  # (E,) data-dependent
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (E, NC), 1)
    onehot = (cols_iota == iv[:, None]).astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        onehot, tbl_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (E, K) — ONE bf16 pass; trilo would need 3 (B hi/mid/lo)
    out_ref[:] += jnp.sum(g.reshape(E // 8, 8, K), axis=0)


def measure_onehot_gather(NC: int, K: int, E: int = 512, steps: int = 512):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NC, (steps, 1, E)).astype(np.int32))
    tbl = jnp.asarray(rng.standard_normal((NC, K)).astype(np.float32))
    x = jnp.ones((8, K), jnp.float32)

    def run(x, idx, tbl):
        # Data dependence that XLA cannot constant-fold (s == 0 at
        # runtime, but only the hardware knows): keeps the kernel inside
        # the timing chain instead of being hoisted as loop-invariant.
        s = jnp.isnan(jnp.sum(x)).astype(jnp.int32).reshape(1)
        return pl.pallas_call(
            functools.partial(_onehot_gather_kernel, E=E, NC=NC, K=K),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((1, 1, E), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NC, K), lambda i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, K), lambda i, s: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * steps * E * NC * K,
                bytes_accessed=steps * E * 4 + NC * K * 4,
                transcendentals=0,
            ),
        )(s, idx, tbl)

    # correctness at small scale
    out = jax.jit(run)(x, idx, tbl)
    idx_h = np.asarray(idx)[:, 0, :]
    tbl_h = np.asarray(tbl)
    g = np.zeros((8, K), np.float64)
    for st in range(steps):
        gg = tbl_h.astype(np.float64)[idx_h[st]]
        g += gg.reshape(E // 8, 8, K).sum(0)
    rel = np.abs(np.asarray(out) - g).max() / max(np.abs(g).max(), 1)
    assert rel < 2e-2, (NC, K, rel)  # one bf16 pass

    r = timing.benchmark_chained(
        lambda c, v: run(v, c[0], c[1]) + v * 0, x, iters=8,
        consts=(idx, tbl))
    slots = steps * E
    ns = r.best_s / slots * 1e9
    model_ns = 2 * NC * K / 181e12 * 1e9
    return ns, model_ns


# ---------------------------------------------------------------------------
# D: plan padding vs col_tile (host-side, no TPU needed)
# ---------------------------------------------------------------------------


def padding_vs_tile(csr, tiles):
    from gespmm_tpu.sparse.partition import build_tiled_plan

    rows = []
    for ct in tiles:
        plan = build_tiled_plan(csr, col_tile=ct, k_hint=512)
        rows.append((ct, plan.num_slots / plan.nnz,
                     plan.parts[0].rows_per_block))
    return rows


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    print("\n== A/B: tpu.dynamic_gather compile envelope ==", flush=True)
    for axis, cases in ((0, [(8, 128), (16, 128), (512, 128)]),
                        (1, [(8, 128), (8, 256)])):
        for T, K in cases:
            r = _try_dynamic_gather(T, K, axis)
            print(f"  axis={axis} table=({T},{K}) f32 -> {r}", flush=True)

    print("\n== C: one-hot MXU gather, ns/slot (1 bf16 pass; trilo = 3x) ==",
          flush=True)
    onehot = {}
    for NC, K in [(128, 512), (256, 512), (512, 512), (2048, 512),
                  (512, 128), (8192, 128)]:
        ns, model = measure_onehot_gather(NC, K)
        onehot[(NC, K)] = ns
        print(f"  ncols={NC:5d} K={K:3d}: {ns:6.2f} ns/slot "
              f"(flops model {model:5.2f})", flush=True)

    print("\n== D: tiled-plan slot inflation vs col_tile (rmat16) ==",
          flush=True)
    from gespmm_tpu.utils.datasets import rmat_graph

    csr = rmat_graph(scale=16, edge_factor=16, seed=0)
    rows = padding_vs_tile(csr, [128, 256, 512, 2048, 8192, 16384])
    for ct, infl, R in rows:
        print(f"  col_tile={ct:6d}: slots/nnz = {infl:5.2f}  (R={R})",
              flush=True)

    print("""
== Conclusion ==
The stream round-trip a fused kernel would save costs ~5.2 ns/slot at
K=512 (2*K*4 bytes at 795 GB/s) plus ~2-3 ns of gather issue.  Mosaic's
dynamic_gather cannot read more than one vreg along the gather dimension
(A/B above), so the only in-kernel gather is the one-hot MXU form (C),
whose cost is linear in the tile width — affordable only at ncols<=512.
At those widths the plan's slot inflation (D) multiplies EVERY per-slot
cost by the measured factor, erasing the saving several times over on
power-law graphs.  Fusion is therefore not expressible profitably on
this hardware generation; the defensible large-K target is the
materialized-stream bound (stream-roofline-frac), with mode="fast"
(bf16 stream, round 4) as the measured lever on the dominant term.
""", flush=True)


if __name__ == "__main__":
    main()
