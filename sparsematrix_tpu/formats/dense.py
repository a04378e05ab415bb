"""Dense container — the honest fast path for the densify regime.

On TPU, above a few percent density the optimal "sparse" execution is a
dense MXU contraction; `spmm(method="densify")` proves it but pays an XLA
scatter (≈10 ns/element) on *every call* to materialize the matrix.
``Dense`` stores the materialization once at build time (the
encode-once/multiply-many stance again), so SpMV/SpMM are pure MXU ops
with zero per-call overhead, while keeping the sparse-container interface
(shape/nnz/todense/astype) so it composes with the rest of the framework.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .base import SparseFormat, register_sparse_pytree

__all__ = ["Dense"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class Dense(SparseFormat):
    data: jnp.ndarray  # (rows, cols) materialized values
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @classmethod
    def fromdense(cls, dense, dtype=None):
        """``dtype=jnp.bfloat16`` stores the plane half-width: halves the
        dominant HBM stream AND swaps the slow multi-pass fp32 MXU for the
        native bf16 systolic path (measured 37.5 → ~12 µs at n=2048
        k=128).  Accuracy ~1e-2 relative — inside the reference's 0.1
        relative-error policy (blas_test.h:163-173)."""
        dense = np.asarray(dense)
        arr = jnp.asarray(dense)
        if dtype is not None:
            arr = arr.astype(dtype)
        return cls(
            data=arr,
            shape=(int(dense.shape[0]), int(dense.shape[1])),
            nnz=int((dense != 0).sum()),
        )

    @classmethod
    def from_sparse(cls, sp, dtype=None):
        """Materialize any sparse container once (host/device build step)."""
        arr = jnp.asarray(sp.todense())
        if dtype is not None:
            arr = arr.astype(dtype)
        return cls(
            data=arr,
            shape=sp.shape,
            nnz=sp.nnz,
        )

    def todense(self):
        return self.data

    def transpose(self) -> "Dense":
        return Dense(data=self.data.T, shape=(self.shape[1], self.shape[0]),
                     nnz=self.nnz)

    @property
    def T(self) -> "Dense":
        return self.transpose()

    @property
    def density(self) -> float:
        return self.nnz / (self.shape[0] * self.shape[1])
