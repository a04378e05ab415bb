from .partition import PartitionedCSR, partition_csr_rows, partition_csr_cols
from .dist_ops import dist_spmv, dist_spmm, shard_partitioned, make_mesh

__all__ = [
    "PartitionedCSR",
    "partition_csr_rows",
    "partition_csr_cols",
    "dist_spmv",
    "dist_spmm",
    "shard_partitioned",
    "make_mesh",
]
