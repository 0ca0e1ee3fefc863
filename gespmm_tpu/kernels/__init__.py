"""Pallas TPU kernels — the hand-tiled compute tier.

Availability probes let the op-layer dispatch (`ops/spmm.py`,
`ops/sddmm.py`) fall back to the XLA formulation when a kernel is not
implemented for the requested configuration — the same role the cuSPARSE
fallback plays in the reference (`binary_reduce_sum.cu:365-398`).
"""


def spmm_kernel_available() -> bool:
    try:
        from gespmm_tpu.kernels import spmm_pallas  # noqa: F401

        return True
    except Exception:
        return False
