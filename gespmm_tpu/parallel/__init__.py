from gespmm_tpu.parallel.mesh import make_mesh
from gespmm_tpu.parallel.dist_spmm import (
    PartitionedAdjacency,
    partition_adjacency,
    dist_spmm,
)

__all__ = [
    "make_mesh",
    "PartitionedAdjacency",
    "partition_adjacency",
    "dist_spmm",
]
