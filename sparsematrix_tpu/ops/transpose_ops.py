"""Transposed products: ``A^T @ x`` / ``A^T @ X`` without materializing A^T.

CSR stores rows; the transposed product is the same gather-multiply with
the roles of ``row_ids`` and ``indices`` swapped — a scatter-add over
columns.  Useful directly (normal equations, AD) and as the building block
for gradient rules.  Padding entries carry zero data so the scatter is
harmless.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import CSR, COO

__all__ = ["spmv_t", "spmm_t"]


def _ids(A):
    if isinstance(A, CSR):
        return A._row_ids_or_compute(), A.indices
    if isinstance(A, COO):
        return A.row, A.col
    raise TypeError(f"transposed ops support CSR/COO, got {type(A).__name__}")


def spmv_t(A, y):
    """``x = A^T @ y`` for CSR/COO ``A`` (shape m×n), ``y`` length m."""
    if y.shape[0] != A.shape[0]:
        raise ValueError(f"spmv_t: y shape {y.shape} vs matrix {A.shape}")
    rid, cid = _ids(A)
    prod = A.data * jnp.where(rid < A.shape[0], y[jnp.minimum(rid, A.shape[0] - 1)], 0)
    return jax.ops.segment_sum(prod, cid, num_segments=A.shape[1])


def spmm_t(A, Y):
    """``X = A^T @ Y`` for CSR/COO ``A`` (m×n), ``Y`` (m, k)."""
    if Y.shape[0] != A.shape[0]:
        raise ValueError(f"spmm_t: Y shape {Y.shape} vs matrix {A.shape}")
    rid, cid = _ids(A)
    safe_rid = jnp.minimum(rid, A.shape[0] - 1)
    gathered = jnp.where((rid < A.shape[0])[:, None], Y[safe_rid], 0)
    prod = A.data[:, None] * gathered
    return jax.ops.segment_sum(prod, cid, num_segments=A.shape[1])
