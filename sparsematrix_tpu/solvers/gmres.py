"""Restarted GMRES(m) over the sparse ops.

Fixed-size Krylov basis (static shapes for XLA): inner Arnoldi loop is a
``lax.fori_loop`` over a preallocated (restart, n) basis; the small
least-squares problem is solved densely per restart.  Optional left
preconditioning.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import spmv
from .krylov import SolveResult

__all__ = ["gmres"]


def _as_linop(A) -> Callable:
    if callable(A):
        return A
    return lambda v: spmv(A, v)


def gmres(A, b, x0=None, tol: float = 1e-6, restart: int = 30,
          maxiter: int = 20, M: Optional[Callable] = None) -> SolveResult:
    """Restarted GMRES: ``maxiter`` outer restarts of dimension ``restart``."""
    matvec = _as_linop(A)
    precond = M if M is not None else (lambda r: r)
    n = b.shape[0]
    x = jnp.zeros_like(b) if x0 is None else x0
    bnorm = jnp.maximum(jnp.linalg.norm(precond(b)), 1e-30)

    def arnoldi_cycle(x):
        r = precond(b - matvec(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((restart + 1, n), b.dtype)
        H = jnp.zeros((restart + 1, restart), b.dtype)
        V = V.at[0].set(r / jnp.maximum(beta, 1e-30))

        def body(j, carry):
            V, H = carry
            w = precond(matvec(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked)
            def mgs(i, wh):
                w, hcol = wh
                h = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
                return (w - h * V[i], hcol.at[i].set(h))

            w, hcol = jax.lax.fori_loop(0, restart + 1, mgs,
                                        (w, jnp.zeros(restart + 1, b.dtype)))
            hnext = jnp.linalg.norm(w)
            hcol = hcol.at[j + 1].set(hnext)
            V = V.at[j + 1].set(w / jnp.maximum(hnext, 1e-30))
            H = H.at[:, j].set(hcol)
            return (V, H)

        V, H = jax.lax.fori_loop(0, restart, body, (V, H))
        # solve min || beta*e1 - H y ||
        e1 = jnp.zeros(restart + 1, b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1, rcond=None)
        return x + V[:restart].T @ y, beta

    def cond(state):
        x, k, res = state
        return jnp.logical_and(k < maxiter, res / bnorm > tol)

    def body(state):
        x, k, _ = state
        x, _ = arnoldi_cycle(x)
        res = jnp.linalg.norm(precond(b - matvec(x)))
        return (x, k + 1, res)

    res0 = jnp.linalg.norm(precond(b - matvec(x)))
    x, k, res = jax.lax.while_loop(cond, body, (x, 0, res0))
    return SolveResult(x=x, iters=k, residual=res)
