"""LSQR — sparse least squares / minimum-norm solves.

Golub–Kahan bidiagonalization (Paige & Saunders 1982) over the framework's
sparse products: ``A @ v`` via ``ops.spmv`` and ``A^T @ u`` via
``ops.spmv_t`` (no transposed matrix is ever materialized).  Fully
jittable (``lax.while_loop``), rectangular ``A`` supported.

The reference has no solver layer (SURVEY §1: "no runtime above L3");
this extends the north-star solver surface (CG/BiCGSTAB/GMRES) to
least-squares problems.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops import spmv, spmv_t

__all__ = ["lsqr", "LsqrResult"]


class LsqrResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # int32
    residual: jnp.ndarray  # |A x - b|
    normal_residual: jnp.ndarray  # |A^T (A x - b)| (0 at any LS solution)


def _ops(A) -> Tuple[Callable, Callable]:
    if isinstance(A, tuple):
        mv, rmv = A
        return mv, rmv
    return (lambda v: spmv(A, v)), (lambda u: spmv_t(A, u))


def _sym_ortho(a, b):
    """Stable Givens rotation (the LSQR paper's SymOrtho)."""
    r = jnp.sqrt(a * a + b * b)
    c = jnp.where(r > 0, a / jnp.maximum(r, 1e-30), 1.0)
    s = jnp.where(r > 0, b / jnp.maximum(r, 1e-30), 0.0)
    return c, s, r


def lsqr(A, b, x0=None, atol: float = 1e-6, btol: float = 1e-6,
         maxiter: int = 1000, damp: float = 0.0) -> LsqrResult:
    """Minimize ``|A x - b|²  (+ damp²|x|²)`` for sparse/rectangular ``A``.

    ``A`` is a sparse container (CSR/COO) or a ``(matvec, rmatvec)`` pair.
    Stopping follows the standard LSQR criteria on ``|r|`` and ``|A^T r|``.
    """
    matvec, rmatvec = _ops(A)
    m_len = b.shape[0]
    # x size from a probe rmatvec on zeros (shape-only, traced away)
    x = rmatvec(jnp.zeros_like(b)) * 0.0 if x0 is None else x0
    u = b - matvec(x) if x0 is not None else b
    beta = jnp.linalg.norm(u)
    u = u / jnp.maximum(beta, 1e-30)
    v = rmatvec(u)
    alpha = jnp.linalg.norm(v)
    v = v / jnp.maximum(alpha, 1e-30)
    w = v
    phibar = beta
    rhobar = alpha
    bnorm = jnp.maximum(beta, 1e-30)

    State = tuple  # (x, u, v, w, alpha, phibar, rhobar, anorm, k, arnorm)
    init = (x, u, v, w, alpha, phibar, rhobar, jnp.asarray(0.0, b.dtype),
            jnp.asarray(0, jnp.int32), alpha * beta)

    def cond(st):
        x, u, v, w, alpha_, phibar_, rhobar_, anorm, k, arnorm = st
        rnorm = jnp.abs(phibar_)
        not_conv = jnp.logical_and(
            rnorm > btol * bnorm + atol * anorm * jnp.linalg.norm(x) + 1e-30,
            arnorm > atol * jnp.maximum(anorm, 1e-30) * jnp.maximum(rnorm, 1e-30),
        )
        return jnp.logical_and(k < maxiter, not_conv)

    def body(st):
        x, u, v, w, alpha_, phibar_, rhobar_, anorm, k, _ = st
        # bidiagonalization step
        u_new = matvec(v) - alpha_ * u
        beta_ = jnp.linalg.norm(u_new)
        u_new = u_new / jnp.maximum(beta_, 1e-30)
        v_new = rmatvec(u_new) - beta_ * v
        alpha_new = jnp.linalg.norm(v_new)
        v_new = v_new / jnp.maximum(alpha_new, 1e-30)
        anorm = jnp.sqrt(anorm**2 + alpha_**2 + beta_**2 + damp**2)
        # eliminate damping (rotation on the regularized bidiagonal)
        rhobar1 = jnp.sqrt(rhobar_**2 + damp**2)
        c1 = rhobar_ / jnp.maximum(rhobar1, 1e-30)
        phibar1 = c1 * phibar_
        # Givens rotation zeroing beta_
        c, s, rho = _sym_ortho(rhobar1, beta_)
        theta = s * alpha_new
        rhobar_new = -c * alpha_new
        phi = c * phibar1
        phibar_new = s * phibar1
        x = x + (phi / jnp.maximum(rho, 1e-30)) * w
        w = v_new - (theta / jnp.maximum(rho, 1e-30)) * w
        # ||A^T r|| = alpha_{k+1}|s_k c_k phibar1| (Paige–Saunders eq. 5.2;
        # scipy's tau = sn*phi) — dropping the cosine overestimates it and
        # the loop runs far past the LS solution on inconsistent systems
        arnorm = alpha_new * jnp.abs(s * phi)
        return (x, u_new, v_new, w, alpha_new, phibar_new, rhobar_new,
                anorm, k + 1, arnorm)

    st = jax.lax.while_loop(cond, body, init)
    x, u, v, w, alpha_, phibar_, rhobar_, anorm, k, arnorm = st
    return LsqrResult(x=x, iters=k, residual=jnp.abs(phibar_),
                      normal_residual=arnorm)
