"""Sparse triangular solve ``L x = b`` / ``U x = b``.

TPU-native design — **level scheduling**: the dependency DAG of the
triangular matrix is stratified on the host into levels whose rows are
mutually independent; the device then runs a ``lax.scan`` over levels, each
step solving its whole level vectorized (gather of already-solved x,
segment-sum of off-diagonal products, divide by diagonal).  Shapes are
static: levels are padded to the max level width with sentinel rows
(the harmless-padding design again).

No reference analogue (SURVEY §7 phase C); verified against scipy
``spsolve_triangular``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSR
from ..formats.base import default_index_dtype, register_sparse_pytree

__all__ = ["TriSolvePlan", "trisolve_plan", "trisolve_apply", "trisolve"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class TriSolvePlan:
    """Level-scheduled triangular structure for a fixed sparsity pattern.

    Per level l and slot s: ``rows[l, s]`` is the row solved there (or n for
    padding).  Off-diagonal entries of each row are padded to ``max_row_nnz``
    with (col=0, a zero value at numeric time).
    """

    rows: jnp.ndarray  # (n_levels, max_width) int32, pad = n
    offdiag_cols: jnp.ndarray  # (n_levels, max_width, max_row_nnz)
    offdiag_vals: jnp.ndarray  # (n_levels, max_width, max_row_nnz)
    diag_vals: jnp.ndarray  # (n_levels, max_width) — pad rows get 1.0
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    lower: bool = dataclasses.field(metadata={"static": True})
    unit_diagonal: bool = dataclasses.field(metadata={"static": True})


def trisolve_plan(A: CSR, lower: bool = True,
                  unit_diagonal: bool = False) -> TriSolvePlan:
    sp = A.to_scipy().tocsr()
    n = sp.shape[0]
    if sp.shape[0] != sp.shape[1]:
        raise ValueError("trisolve needs a square matrix")
    indptr, indices, data = sp.indptr, sp.indices, sp.data

    # compute levels: level(i) = 1 + max level of off-diag deps
    level = np.zeros(n, dtype=np.int64)
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        deps = indices[indptr[i] : indptr[i + 1]]
        if lower:
            deps = deps[deps < i]
        else:
            deps = deps[deps > i]
        level[i] = 1 + max((level[d] for d in deps), default=-1)
    n_levels = int(level.max()) + 1 if n else 1

    lvl_rows = [np.nonzero(level == l)[0] for l in range(n_levels)]
    max_width = max((len(r) for r in lvl_rows), default=1)
    max_width = max(max_width, 1)
    max_row_nnz = 1
    for i in range(n):
        cnt = 0
        for s in range(indptr[i], indptr[i + 1]):
            j = indices[s]
            if (lower and j < i) or ((not lower) and j > i):
                cnt += 1
        max_row_nnz = max(max_row_nnz, cnt)

    rows = np.full((n_levels, max_width), n, dtype=np.int64)
    od_cols = np.zeros((n_levels, max_width, max_row_nnz), dtype=np.int64)
    od_vals = np.zeros((n_levels, max_width, max_row_nnz), dtype=data.dtype)
    dvals = np.ones((n_levels, max_width), dtype=data.dtype)
    for l, rlist in enumerate(lvl_rows):
        for s, i in enumerate(rlist):
            rows[l, s] = i
            kk = 0
            diag = None
            for t in range(indptr[i], indptr[i + 1]):
                j = indices[t]
                if j == i:
                    diag = data[t]
                elif (lower and j < i) or ((not lower) and j > i):
                    od_cols[l, s, kk] = j
                    od_vals[l, s, kk] = data[t]
                    kk += 1
            if unit_diagonal:
                dvals[l, s] = 1.0
            else:
                if diag is None or diag == 0:
                    raise ValueError(f"zero/missing diagonal at row {i}")
                dvals[l, s] = diag

    idt = default_index_dtype
    return TriSolvePlan(
        rows=jnp.asarray(rows, idt),
        offdiag_cols=jnp.asarray(od_cols, idt),
        offdiag_vals=jnp.asarray(od_vals),
        diag_vals=jnp.asarray(dvals),
        shape=(n, n),
        lower=lower,
        unit_diagonal=unit_diagonal,
    )


def trisolve_apply(plan: TriSolvePlan, b):
    """Device numeric solve (jittable): scan over levels."""
    n = plan.shape[0]
    x0 = jnp.zeros((n + 1,), b.dtype)  # slot n = padding target
    bp = jnp.concatenate([b, jnp.zeros((1,), b.dtype)])

    def step(x, lvl):
        rows, od_cols, od_vals, dvals = lvl
        # gather solved x at dependency columns: (width, max_row_nnz)
        contrib = jnp.sum(od_vals * x[od_cols], axis=1)
        xi = (bp[rows] - contrib) / dvals
        x = x.at[rows].set(xi)  # padding rows write slot n
        return x, None

    x, _ = jax.lax.scan(
        step, x0, (plan.rows, plan.offdiag_cols, plan.offdiag_vals,
                   plan.diag_vals)
    )
    return x[:n]


def trisolve(A: CSR, b, lower: bool = True, unit_diagonal: bool = False):
    """One-shot triangular solve (host plan + device apply)."""
    plan = trisolve_plan(A, lower=lower, unit_diagonal=unit_diagonal)
    return trisolve_apply(plan, b)
