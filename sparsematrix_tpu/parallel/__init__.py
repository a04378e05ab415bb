from .partition import PartitionedCSR, partition_csr_rows, partition_csr_cols
from .dist_ops import dist_spmv, dist_spmm, shard_partitioned, make_mesh
from .dist_block import (
    PartitionedBlockedELL,
    partition_bell_rows,
    shard_bell,
    dist_spmm_bell,
)
from .dist2d import make_mesh_2d, dist_spmm_2d
from .multihost import initialize_multihost, global_mesh
from .halo import (
    HaloPartitionedCSR,
    partition_csr_halo,
    dist_spmv_halo,
)
from .halo import shard_halo
from .dist_spgemm import (
    DistSpGEMMPlan,
    dist_spgemm_plan,
    dist_spgemm_apply,
    shard_dist_spgemm,
)

__all__ = [
    "PartitionedCSR",
    "partition_csr_rows",
    "partition_csr_cols",
    "dist_spmv",
    "dist_spmm",
    "shard_partitioned",
    "make_mesh",
    "DistSpGEMMPlan",
    "dist_spgemm_plan",
    "dist_spgemm_apply",
    "shard_dist_spgemm",
    "PartitionedBlockedELL",
    "partition_bell_rows",
    "shard_bell",
    "dist_spmm_bell",
    "HaloPartitionedCSR",
    "partition_csr_halo",
    "shard_halo",
    "dist_spmv_halo",
    "make_mesh_2d",
    "dist_spmm_2d",
    "initialize_multihost",
    "global_mesh",
]
