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
    sa = A.to_scipy().tocsr()
    sb = B.to_scipy().tocsr()
    pattern = ((sa != 0) + (sb != 0)).tocsr()
    pattern.sort_indices()
    c_nnz = int(pattern.nnz)
    m = sa.shape[0]
    c_indptr, c_indices = pattern.indptr, pattern.indices

    def targets(s, cap):
        out = np.full(cap, c_nnz, dtype=np.int64)  # pad → drop slot
        w = 0
        for i in range(m):
            slots = {
                int(c_indices[t]): t
                for t in range(c_indptr[i], c_indptr[i + 1])
            }
            for e in range(s.indptr[i], s.indptr[i + 1]):
                out[w] = slots[int(s.indices[e])]
                w += 1
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
