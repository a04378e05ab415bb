"""Sparse + sparse addition over different patterns — union-plan design.

Same symbolic/numeric split as SpGEMM: the host computes the union
structure once and the slot each input entry lands in; the device numeric
phase is two segment-sums (jittable, reusable for new values on the same
patterns).  ``alpha*A + beta*B`` with arbitrary CSR patterns.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSR
from ..formats.base import default_index_dtype, register_sparse_pytree

__all__ = ["SparseAddPlan", "sparse_add_plan", "sparse_add_apply", "sparse_add"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SparseAddPlan:
    a_target: jnp.ndarray  # (a_cap,) slot in C per A entry (pad → drop slot)
    b_target: jnp.ndarray  # (b_cap,)
    c_indptr: jnp.ndarray
    c_indices: jnp.ndarray
    c_row_ids: jnp.ndarray
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    c_nnz: int = dataclasses.field(metadata={"static": True})


def sparse_add_plan(A: CSR, B: CSR) -> SparseAddPlan:
    if A.shape != B.shape:
        raise ValueError(f"sparse_add: shapes {A.shape} vs {B.shape}")
    import scipy.sparse as sps

    sa = A.to_scipy().tocsr()
    sb = B.to_scipy().tocsr()
    sa.sort_indices()
    sb.sort_indices()
    m, n = sa.shape
    # union pattern from STRUCTURE (indicator data), not values — an
    # explicitly-stored zero entry is a legal stored slot and must get a
    # target like any other
    ind = lambda s: sps.csr_matrix(
        (np.ones(len(s.indices), np.int8), s.indices, s.indptr), shape=s.shape
    )
    pattern = (ind(sa) + ind(sb)).tocsr()
    pattern.sort_indices()
    c_nnz = int(pattern.nnz)
    c_indptr, c_indices = pattern.indptr, pattern.indices
    # row-major + col-sorted ⇒ row*n + col is globally sorted: each input
    # entry's slot is a single vectorized searchsorted
    c_rows = np.repeat(np.arange(m), np.diff(c_indptr))
    key_c = c_rows.astype(np.int64) * n + c_indices.astype(np.int64)

    def targets(s, cap):
        rows_s = np.repeat(np.arange(m), np.diff(s.indptr))
        key_s = rows_s.astype(np.int64) * n + s.indices.astype(np.int64)
        out = np.full(cap, c_nnz, dtype=np.int64)  # pad → drop slot
        out[: len(key_s)] = np.searchsorted(key_c, key_s)
        return out

    idt = default_index_dtype
    crow = np.full(max(c_nnz, 1), m, np.int64)
    crow[:c_nnz] = np.repeat(np.arange(m), np.diff(c_indptr))
    ci = np.zeros(max(c_nnz, 1), np.int64)
    ci[:c_nnz] = c_indices
    return SparseAddPlan(
        a_target=jnp.asarray(targets(sa, A.capacity), idt),
        b_target=jnp.asarray(targets(sb, B.capacity), idt),
        c_indptr=jnp.asarray(c_indptr, idt),
        c_indices=jnp.asarray(ci, idt),
        c_row_ids=jnp.asarray(crow, idt),
        shape=A.shape,
        c_nnz=c_nnz,
    )


def sparse_add_apply(plan: SparseAddPlan, a_data, b_data, alpha=1.0,
                     beta=1.0) -> CSR:
    cap = plan.c_indices.shape[0]
    c = jax.ops.segment_sum(alpha * a_data, plan.a_target,
                            num_segments=cap + 1)[:-1]
    c = c + jax.ops.segment_sum(beta * b_data, plan.b_target,
                                num_segments=cap + 1)[:-1]
    return CSR(
        indptr=plan.c_indptr,
        indices=plan.c_indices,
        data=c,
        row_ids=plan.c_row_ids,
        shape=plan.shape,
        nnz=plan.c_nnz,
    )


def sparse_add(A: CSR, B: CSR, alpha=1.0, beta=1.0) -> CSR:
    """``alpha*A + beta*B`` over the union pattern."""
    plan = sparse_add_plan(A, B)
    return sparse_add_apply(plan, A.data, B.data, alpha, beta)
