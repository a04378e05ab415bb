"""Sparse direct solve: host SuperLU factorization, device-resident solves.

Factorization is a one-time host step (scipy ``splu`` — supernodal LU
with fill-reducing column permutation); the triangular factors are then
packed into the fused single-pallas-call solve plans
(kernels/trisolve_fused.py), so REPEATED solves against new right-hand
sides run entirely on device: two gathers (the row/column permutations)
around two fused triangular solves.

scipy's convention is ``A = Pr^T @ L @ U @ Pc^T`` (perm_r/perm_c as
index arrays), hence ``x = Pc @ U⁻¹ L⁻¹ (Pr @ b)``; both permutations
become device gathers with host-precomputed index vectors.

The reference has no solver layer (SURVEY §1); this rounds out the
north-star solve surface (iterative CG/BiCGSTAB/GMRES/LSQR +
incomplete-factor preconditioners) with an exact direct method.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..formats.base import register_sparse_pytree
from ..formats.csr import CSR

__all__ = ["splu_plans", "splu_solve", "SpluSolver"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SpluSolver:
    l_plan: object  # TriWavesPlan or TriFusedPlan, unit-lower
    u_plan: object  # TriWavesPlan or TriFusedPlan, upper
    inv_perm_r: jnp.ndarray  # (n,) int32 — gather indices for Pr @ b
    perm_c: jnp.ndarray  # (n,) int32 — gather indices for Pc @ y
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    lu_nnz: int = dataclasses.field(metadata={"static": True})  # fill incl.


def splu_plans(A: CSR, engine: str = "waves", **plan_kwargs) -> SpluSolver:
    """Factor ``A`` (square, nonsingular) with SuperLU and build the
    device solve plans.

    ``engine``: "waves" (default — host-inverted block solves,
    kernels/trisolve_waves.py, 6-17x the fused engine) or "fused"
    (slab-walk solves; use for very large factors where the wave
    inverse blocks would outgrow HBM, or when the solver must be
    differentiable in the factor values).  ``plan_kwargs`` forward to
    the chosen plan builder (e.g. ``dtype=jnp.bfloat16``, binv ``m=``).
    """
    import scipy.sparse.linalg as spla

    from ..kernels.trisolve_fused import trisolve_fused_plan
    from ..kernels.trisolve_waves import trisolve_waves_plan

    if A.shape[0] != A.shape[1]:
        raise ValueError(f"splu needs a square matrix, got {A.shape}")
    if engine not in ("waves", "fused"):
        raise ValueError(f"unknown engine {engine!r}")
    lu = spla.splu(A.to_scipy().tocsc())
    n = A.shape[0]
    L = CSR.from_scipy(lu.L.tocsr())
    U = CSR.from_scipy(lu.U.tocsr())
    plan = trisolve_waves_plan if engine == "waves" else trisolve_fused_plan
    # (Pr @ b)[perm_r[i]] = b[i]  ⇔  gather with the inverse permutation
    inv_pr = np.empty(n, np.int32)
    inv_pr[lu.perm_r] = np.arange(n, dtype=np.int32)
    return SpluSolver(
        l_plan=plan(L, lower=True, unit_diagonal=True, **plan_kwargs),
        u_plan=plan(U, lower=False, unit_diagonal=False, **plan_kwargs),
        inv_perm_r=jnp.asarray(inv_pr),
        perm_c=jnp.asarray(lu.perm_c.astype(np.int32)),
        shape=A.shape,
        lu_nnz=int(lu.L.nnz + lu.U.nnz),
    )


def splu_solve(solver: SpluSolver, b):
    """``x = A⁻¹ b`` on device (jittable): gather → L-solve → U-solve →
    gather.  ``b`` is a vector (n,) or a multi-RHS panel (n, k) — the
    waves engine then runs its MXU multi-RHS kernel (8 RHS per grid
    pass)."""
    from ..kernels.trisolve_fused import (trisolve_fused_apply,
                                          trisolve_fused_apply_batched)
    from ..kernels.trisolve_waves import (TriWavesPlan,
                                          trisolve_waves_apply,
                                          trisolve_waves_apply_mm)

    waves = isinstance(solver.l_plan, TriWavesPlan)
    if jnp.ndim(b) == 2:
        apply_ = (trisolve_waves_apply_mm if waves
                  else trisolve_fused_apply_batched)
    else:
        apply_ = trisolve_waves_apply if waves else trisolve_fused_apply
    y = b[solver.inv_perm_r]
    y = apply_(solver.l_plan, y)
    y = apply_(solver.u_plan, y)
    return y[solver.perm_c]
