"""Krylov solvers (CG, BiCGSTAB) over the sparse ops, with optional
ILU(0)/custom preconditioning.

Fully jittable: fixed-iteration ``lax.while_loop`` with residual stopping,
built on ``ops.spmv`` so every format (CSR/BSR/ELL/codebook) works and the
whole solve stays on-device.  The reference has no solver layer; this is
the north-star "framework" surface users actually call (SpMV/trisolve/ILU
compose here).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import spmv

__all__ = ["cg", "bicgstab", "SolveResult"]


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    residual: jnp.ndarray  # final |r|
    # True when the method hit a numerical breakdown (e.g. BiCGSTAB's
    # rho/omega ~ 0) and stopped early; the residual is still reported.
    breakdown: bool = False


def _as_linop(A) -> Callable:
    if callable(A):
        return A
    return lambda v: spmv(A, v)


def cg(A, b, x0=None, tol: float = 1e-6, maxiter: int = 1000,
       M: Optional[Callable] = None) -> SolveResult:
    """Conjugate gradients for SPD ``A`` (sparse container or linop).
    ``M`` is a preconditioner callable ``r -> M⁻¹ r`` (e.g. ``ilu_apply``
    partial)."""
    matvec = _as_linop(A)
    precond = M if M is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        x, r, p, rz, k = state
        return jnp.logical_and(k < maxiter, jnp.linalg.norm(r) / bnorm > tol)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, 0))
    return SolveResult(x=x, iters=k, residual=jnp.linalg.norm(r))


def bicgstab(A, b, x0=None, tol: float = 1e-6, maxiter: int = 1000,
             M: Optional[Callable] = None) -> SolveResult:
    """BiCGSTAB for general (nonsymmetric) ``A``."""
    matvec = _as_linop(A)
    precond = M if M is not None else (lambda r: r)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    rho = alpha = omega = jnp.asarray(1.0, b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        x, r, rhat, rho, alpha, omega, v, p, k = state
        return jnp.logical_and(k < maxiter, jnp.linalg.norm(r) / bnorm > tol)

    def body(state):
        x, r, rhat, rho, alpha, omega, v, p, k = state
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1e-30, rho)) * (
            alpha / jnp.where(omega == 0, 1e-30, omega)
        )
        p = r + beta * (p - omega * v)
        phat = precond(p)
        v = matvec(phat)
        alpha = rho_new / jnp.where(jnp.vdot(rhat, v) == 0, 1e-30,
                                    jnp.vdot(rhat, v))
        s = r - alpha * v
        shat = precond(s)
        t = matvec(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.where(tt == 0, 0.0, jnp.vdot(t, s) / jnp.where(tt == 0, 1e-30, tt))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return (x, r, rhat, rho_new, alpha, omega, v, p, k + 1)

    state = (x, r, rhat, rho, alpha, omega, v, p, 0)
    x, r, *_, k = jax.lax.while_loop(cond, body, state)
    return SolveResult(x=x, iters=k, residual=jnp.linalg.norm(r))
