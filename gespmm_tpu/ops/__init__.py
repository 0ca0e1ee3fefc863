from gespmm_tpu.ops.spmm import spmm, Adjacency
from gespmm_tpu.ops.sddmm import sddmm, sddmm_coo
from gespmm_tpu.ops import graph

__all__ = ["spmm", "Adjacency", "sddmm", "sddmm_coo", "graph"]
