"""Roofline accounting: HBM-traffic models per op/format → speed-of-light
nnz/s on the target chip, so measured numbers can be reported as % of SoL
(the BASELINE.json metric: ≥80% of speed-of-light nnz/s for CSR SpMV).

Sparse ops on TPU are memory-bound (like the reference's AXPY stream,
SURVEY §6: ~16 GFLOP/s on a CPU that does hundreds dense); the ceiling is
HBM bytes moved, not FLOPs.
"""
from __future__ import annotations

from dataclasses import dataclass

__all__ = ["ChipSpec", "V5E", "spmv_csr_bytes", "spmm_bytes", "speed_of_light_nnz_s"]


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth GB/s
    bf16_tflops: float
    fp32_tflops: float


# TPU v5e public specs: 16 GB HBM2 @ ~819 GB/s, 197 bf16 TFLOP/s / MXU
V5E = ChipSpec(name="v5e", hbm_gbps=819.0, bf16_tflops=197.0, fp32_tflops=49.0)


def spmv_csr_bytes(nnz: int, rows: int, cols: int, val_bytes: int = 4,
                   idx_bytes: int = 4) -> int:
    """Minimum HBM traffic for CSR SpMV: read data + indices + x once,
    write y once.  (x re-reads due to random access are excluded — this is
    the optimistic speed-of-light.)"""
    return nnz * (val_bytes + idx_bytes) + cols * val_bytes + rows * val_bytes


def spmm_bytes(nnz: int, rows: int, cols: int, k: int, val_bytes: int = 4,
               idx_bytes: int = 4, stored_block_waste: float = 1.0) -> int:
    """Minimum HBM traffic for SpMM vs k dense RHS columns.
    ``stored_block_waste`` ≥ 1 inflates matrix bytes for padded block
    layouts (blocked-ELL stores zero-filled blocks)."""
    matrix = int(nnz * (val_bytes + idx_bytes) * stored_block_waste)
    rhs = cols * k * val_bytes
    out = rows * k * val_bytes
    return matrix + rhs + out


def speed_of_light_nnz_s(nnz: int, traffic_bytes: int,
                         chip: ChipSpec = V5E) -> float:
    """nnz/s if the op ran at full HBM bandwidth."""
    seconds = traffic_bytes / (chip.hbm_gbps * 1e9)
    return nnz / seconds
