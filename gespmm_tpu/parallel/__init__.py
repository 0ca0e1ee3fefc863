from gespmm_tpu.parallel.mesh import make_mesh
from gespmm_tpu.parallel.dist_spmm import (
    PartitionedAdjacency,
    partition_adjacency,
    dist_spmm,
)
from gespmm_tpu.parallel.halo import (
    HaloPartition,
    build_halo_partition,
    halo_spmm,
    pad_for_halo,
)

__all__ = [
    "make_mesh",
    "PartitionedAdjacency",
    "partition_adjacency",
    "dist_spmm",
    "HaloPartition",
    "build_halo_partition",
    "halo_spmm",
    "pad_for_halo",
]
