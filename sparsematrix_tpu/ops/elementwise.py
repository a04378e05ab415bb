"""Elementwise / structural utility ops on sparse containers.

All jit-safe: they act on the value vector only (structure is static), the
sentinel-padding invariant (zero values at padded slots) is preserved by
every op here.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..formats import CSR

__all__ = ["scale", "axpy_same_pattern", "diagonal", "frobenius_norm",
           "with_data"]


def with_data(A, data):
    """Replace the value vector (same structure)."""
    return dataclasses.replace(A, data=data)


def scale(A, alpha):
    """``alpha * A`` — preserves padding (alpha * 0 == 0)."""
    return with_data(A, A.data * alpha)


def axpy_same_pattern(alpha, A, B):
    """``alpha*A + B`` for containers with identical sparsity structure
    (same class, same indices).  Structure equality is the caller's
    contract; only shapes are checked (cheap, static)."""
    if type(A) is not type(B) or A.shape != B.shape or A.data.shape != B.data.shape:
        raise ValueError("axpy_same_pattern requires identical structure")
    return with_data(B, alpha * A.data + B.data)


def diagonal(A: CSR):
    """Extract the main diagonal of a CSR as a dense vector."""
    n = min(A.shape)
    rid = A._row_ids_or_compute()
    is_diag = (rid == A.indices) & (rid < n)
    contrib = jnp.where(is_diag, A.data, 0)
    seg = jnp.where(is_diag, rid, n)
    import jax

    return jax.ops.segment_sum(contrib, seg, num_segments=n + 1)[:n]


def frobenius_norm(A):
    """||A||_F — padding slots hold zeros so no masking is needed."""
    return jnp.sqrt(jnp.sum(A.data.astype(jnp.float32) ** 2))
