"""Worker for the multi-process distributed test (run via subprocess).

Each of two OS processes owns ONE CPU device; `jax.distributed.initialize`
+ gloo collectives connect them — the actual multi-host code path of
SURVEY §5.8 (the virtual-mesh tests exercise the same program in a single
process; this exercises cross-process ppermute and the
`maybe_distributed_init` entry itself).

Usage:  python tests/dist_worker.py <process_id> <num_processes> <port>
Exits 0 iff the sharded halo_spmm forward AND gradient match the dense
oracle on this process's shard.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Drop any inherited device-count flag (pytest's conftest sets 8) — each
# process must own exactly ONE device for a real 2-process mesh.
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
_flags.append("--xla_force_host_platform_device_count=1")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from gespmm_tpu.parallel.mesh import maybe_distributed_init

    maybe_distributed_init(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 1

    import numpy as np
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gespmm_tpu.parallel.halo import (
        build_halo_partition, halo_spmm, pad_for_halo,
    )
    from gespmm_tpu.parallel.mesh import make_mesh
    from gespmm_tpu.sparse.formats import CSR

    # Deterministic graph, identical on every process.
    m = n = 96
    rng = np.random.default_rng(7)
    mat = sp.random(
        m, n, density=0.08, random_state=rng, format="csr", dtype=np.float32
    )
    mat.data[:] = rng.standard_normal(mat.nnz).astype(np.float32)
    csr = CSR(
        indptr=jnp.asarray(mat.indptr.astype(np.int32)),
        indices=jnp.asarray(mat.indices.astype(np.int32)),
        data=jnp.asarray(mat.data),
        shape=(m, n),
    )
    hp = build_halo_partition(csr, nproc, tiled=True, chunk_nnz=16,
                              rows_per_block=16)
    mesh = make_mesh(data=nproc, model=1)

    B = rng.standard_normal((n, 16)).astype(np.float32)
    Bpad = np.asarray(pad_for_halo(hp, jnp.asarray(B)))
    cpp = hp.cpp
    sharding = NamedSharding(mesh, P("data", None))
    Bd = jax.make_array_from_process_local_data(
        sharding, Bpad[pid * cpp : (pid + 1) * cpp], Bpad.shape
    )

    rpp = hp.rpp
    dense = mat.toarray()
    golden = dense @ B  # (m, 16)
    golden_pad = np.zeros((nproc * rpp, 16), np.float32)
    golden_pad[:m] = golden

    for method in ("tiled", "xla"):
        out = jax.jit(
            lambda b, _m=method: halo_spmm(hp, b, mesh, method=_m,
                                           model_axis=None)
        )(Bd)
        local = np.asarray(out.addressable_shards[0].data)
        np.testing.assert_allclose(
            local, golden_pad[pid * rpp : (pid + 1) * rpp],
            rtol=1e-4, atol=1e-4, err_msg=f"forward {method}",
        )

        # Gradient: d sum(sin(C)) / dB = Aᵀ @ cos(A @ B) — exercises the
        # reverse collectives across REAL process boundaries.
        grad = jax.jit(jax.grad(
            lambda b, _m=method: jnp.sum(jnp.sin(
                halo_spmm(hp, b, mesh, method=_m, model_axis=None)
            ))
        ))(Bd)
        g_golden = dense.T @ np.cos(golden)
        g_pad = np.zeros((nproc * cpp, 16), np.float32)
        g_pad[:n] = g_golden
        g_local = np.asarray(grad.addressable_shards[0].data)
        np.testing.assert_allclose(
            g_local, g_pad[pid * cpp : (pid + 1) * cpp],
            rtol=1e-4, atol=1e-4, err_msg=f"grad {method}",
        )

    print(f"OK process {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
