"""Roofline accounting: HBM-traffic models per op/format → speed-of-light
nnz/s on the target chip, so measured numbers can be reported as % of SoL
(the BASELINE.json metric: ≥80% of speed-of-light nnz/s for CSR SpMV).

Sparse ops on TPU are memory-bound (like the reference's AXPY stream,
SURVEY §6: ~16 GFLOP/s on a CPU that does hundreds dense); the ceiling is
HBM bytes moved, not FLOPs.
"""
from __future__ import annotations

from dataclasses import dataclass

__all__ = ["ChipSpec", "V5E", "spmv_csr_bytes", "spmm_bytes",
           "speed_of_light_nnz_s", "set_measured_chip", "active_chip"]


@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth GB/s
    bf16_tflops: float
    fp32_tflops: float


# TPU v5e public specs: 16 GB HBM2 @ ~819 GB/s, 197 bf16 TFLOP/s / MXU
V5E = ChipSpec(name="v5e", hbm_gbps=819.0, bf16_tflops=197.0, fp32_tflops=49.0)

# Session-measured constants (from the suite's calibrate rows).  These are
# recorded for cross-session normalization but are NOT used as the SoL
# denominator — SoL stays against the spec sheet (a value-chained bf16
# matmul measures 181 TFLOP/s ≈ the 197 spec, confirming the chip is a
# genuine v5e; apparent >spec stream numbers came from broken timing of
# plain-XLA elementwise programs through the relay).
_MEASURED: ChipSpec | None = None


def set_measured_chip(hbm_gbps: float, bf16_tflops: float | None = None,
                      fp32_tflops: float | None = None) -> ChipSpec:
    """Record session-measured roofline constants (context only)."""
    global _MEASURED
    _MEASURED = ChipSpec(
        name="measured",
        hbm_gbps=float(hbm_gbps),
        bf16_tflops=float(bf16_tflops or V5E.bf16_tflops),
        fp32_tflops=float(fp32_tflops or V5E.fp32_tflops),
    )
    return _MEASURED


def active_chip() -> ChipSpec:
    """The SoL denominator: always the spec sheet."""
    return V5E


def measured_chip() -> ChipSpec | None:
    return _MEASURED


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
                         chip: ChipSpec | None = None) -> float:
    """nnz/s if the op ran at full HBM bandwidth (session-measured
    bandwidth when calibration has run, else the v5e spec sheet)."""
    if chip is None:
        chip = active_chip()
    seconds = traffic_bytes / (chip.hbm_gbps * 1e9)
    return nnz / seconds
