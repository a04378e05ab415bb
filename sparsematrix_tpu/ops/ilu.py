"""ILU(0) — incomplete LU factorization with zero fill-in.

Host-side factorization (classic IKJ on CSR structure; setup-time work,
like the reference's encode phase) producing unit-lower L and upper U on
A's own sparsity pattern; device-side preconditioner application
``M⁻¹ r = U⁻¹ (L⁻¹ r)`` via the level-scheduled triangular solver.

No reference analogue (SURVEY §7 phase C); verified against
scipy.sparse.linalg.splu on dense-comparable problems and by
preconditioned-residual reduction.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..formats import CSR
from .trisolve import TriSolvePlan, trisolve_apply, trisolve_plan

__all__ = ["ilu0", "ilu0_plans", "ilu_apply"]


def ilu0(A: CSR) -> Tuple[CSR, CSR]:
    """Factor A ≈ L @ U on A's sparsity pattern.  L unit-lower, U upper."""
    sp = A.to_scipy().tocsr()
    sp.sort_indices()
    n = sp.shape[0]
    if sp.shape[0] != sp.shape[1]:
        raise ValueError("ilu0 needs a square matrix")
    indptr, indices = sp.indptr, sp.indices
    a = sp.data.astype(np.float64).copy()

    # column position lookup per row for O(1) pattern membership
    col_pos = [
        {int(indices[s]): s for s in range(indptr[i], indptr[i + 1])}
        for i in range(n)
    ]
    for i in range(n):
        if i not in col_pos[i]:
            raise ValueError(f"ilu0: missing diagonal at row {i}")

    # IKJ variant restricted to the pattern
    for i in range(1, n):
        for s in range(indptr[i], indptr[i + 1]):
            k = int(indices[s])
            if k >= i:
                break
            piv = a[col_pos[k][k]]
            if piv == 0:
                raise ZeroDivisionError(f"ilu0: zero pivot at {k}")
            lik = a[s] / piv
            a[s] = lik
            for t in range(indptr[k], indptr[k + 1]):
                j = int(indices[t])
                if j <= k:
                    continue
                pos = col_pos[i].get(j)
                if pos is not None:
                    a[pos] -= lik * a[t]

    # split into L (unit diag) and U
    import scipy.sparse as ss

    lr, lc, lv = [], [], []
    ur, uc, uv = [], [], []
    for i in range(n):
        lr.append(i)
        lc.append(i)
        lv.append(1.0)
        for s in range(indptr[i], indptr[i + 1]):
            j = int(indices[s])
            if j < i:
                lr.append(i)
                lc.append(j)
                lv.append(a[s])
            else:
                ur.append(i)
                uc.append(j)
                uv.append(a[s])
    dt = sp.data.dtype
    L = CSR.from_scipy(ss.coo_matrix((np.array(lv, dt), (lr, lc)), shape=(n, n)).tocsr())
    U = CSR.from_scipy(ss.coo_matrix((np.array(uv, dt), (ur, uc)), shape=(n, n)).tocsr())
    return L, U


def ilu0_plans(A: CSR) -> Tuple[TriSolvePlan, TriSolvePlan]:
    """Factor + build device solve plans (setup once, apply many)."""
    L, U = ilu0(A)
    return (
        trisolve_plan(L, lower=True, unit_diagonal=True),
        trisolve_plan(U, lower=False, unit_diagonal=False),
    )


def ilu_apply(plans: Tuple[TriSolvePlan, TriSolvePlan], r):
    """Apply the preconditioner: ``M⁻¹ r`` (jittable)."""
    lp, up = plans
    return trisolve_apply(up, trisolve_apply(lp, r))
