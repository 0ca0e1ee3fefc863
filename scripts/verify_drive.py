import sys, numpy as np, scipy.sparse as sp
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), jax.devices(), flush=True)
import gespmm_tpu as gt
from gespmm_tpu.sparse.io import read_mtx_csr
from gespmm_tpu.ops.spmm import Adjacency

csr = read_mtx_csr("/root/reference/data/misc/pubmed.mtx", binary=True)
adj = Adjacency.from_csr(csr, plan=True)
rng = np.random.default_rng(0)
oracle_mat = sp.csr_matrix((np.ones(csr.nnz, np.float32), np.asarray(csr.indices),
                            np.asarray(csr.indptr)), shape=csr.shape)
# K=512 exercises the restructured multi-K-tile path; K=128 the single-tile.
for K in (128, 512):
    B = jnp.asarray(rng.standard_normal((csr.shape[1], K)).astype(np.float32))
    out = jax.jit(gt.spmm, static_argnames=("method",))(adj, B, method="tiled")
    err = np.abs(np.asarray(out) - oracle_mat @ np.asarray(B)).max()
    print(f"K={K} pallas err: {err:.2e}", flush=True)
    assert err < 1e-4
# max-reduce path + grad
B = jnp.asarray(rng.standard_normal((csr.shape[1], 128)).astype(np.float32))
outm = jax.jit(lambda b: gt.spmm(adj, b, reduce="max", method="tiled"))(B)
Bn = np.asarray(B)
indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
gold_max = np.zeros((csr.shape[0], Bn.shape[1]), np.float32)
for r in range(csr.shape[0]):
    lo, hi = indptr[r], indptr[r + 1]
    if hi > lo:
        gold_max[r] = Bn[indices[lo:hi]].max(axis=0)
errm = np.abs(np.asarray(outm) - gold_max).max()
print(f"max-reduce err: {errm:.2e}", flush=True)
assert errm < 1e-4
# bf16 path
Bb = B.astype(jnp.bfloat16)
outb = jax.jit(gt.spmm, static_argnames=("method",))(adj, Bb, method="tiled")
assert outb.dtype == jnp.bfloat16 and bool(jnp.isfinite(outb.astype(jnp.float32)).all())
print("bf16 ok", flush=True)
print("VERIFY_DRIVE_PASSED", flush=True)
