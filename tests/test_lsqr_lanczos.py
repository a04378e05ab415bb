"""LSQR least squares and Lanczos eigensolver vs dense oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.solvers import eigsh_lanczos, lanczos, lsqr


def _sparse_rect(rng, m, n, density=0.15):
    d = (rng.random((m, n)) < density) * rng.uniform(-1, 1, (m, n))
    # guarantee full column rank numerically: add a scaled identity block
    d[:n, :n] += np.eye(n) * 2.0
    return d.astype(np.float32)


def test_lsqr_overdetermined_matches_lstsq(rng):
    m, n = 120, 40
    d = _sparse_rect(rng, m, n)
    A = CSR.fromdense(d)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    res = lsqr(A, jnp.asarray(b), maxiter=200, atol=1e-10, btol=1e-10)
    want, *_ = np.linalg.lstsq(d.astype(np.float64), b, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=2e-3, atol=2e-3)
    # the normal-equations residual is ~0 at any least-squares solution
    r = d.astype(np.float64) @ np.asarray(res.x) - b
    assert np.linalg.norm(d.T.astype(np.float64) @ r) < 1e-2


def test_lsqr_square_consistent_system(rng):
    n = 64
    d = _sparse_rect(rng, n, n)
    x_true = rng.uniform(-1, 1, n).astype(np.float32)
    b = d @ x_true
    res = lsqr(CSR.fromdense(d), jnp.asarray(b), maxiter=300,
               atol=1e-12, btol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=5e-3,
                               atol=5e-3)


def test_lsqr_damped_matches_ridge(rng):
    m, n = 80, 30
    d = _sparse_rect(rng, m, n)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    damp = 0.7
    res = lsqr(CSR.fromdense(d), jnp.asarray(b), maxiter=300, damp=damp,
               atol=1e-12, btol=1e-12)
    dd = d.astype(np.float64)
    want = np.linalg.solve(dd.T @ dd + damp**2 * np.eye(n), dd.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=5e-3, atol=5e-3)


def test_lsqr_jittable(rng):
    m, n = 60, 20
    d = _sparse_rect(rng, m, n)
    A = CSR.fromdense(d)
    f = jax.jit(lambda bb: lsqr(A, bb, maxiter=100).x)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    want, *_ = np.linalg.lstsq(d.astype(np.float64), b, rcond=None)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(b))), want,
                               rtol=5e-3, atol=5e-3)


def test_lsqr_linop_pair(rng):
    """(matvec, rmatvec) callables instead of a container."""
    m, n = 50, 18
    d = _sparse_rect(rng, m, n)
    dj = jnp.asarray(d)
    b = rng.uniform(-1, 1, m).astype(np.float32)
    res = lsqr((lambda v: dj @ v, lambda u: dj.T @ u), jnp.asarray(b),
               maxiter=200)
    want, *_ = np.linalg.lstsq(d.astype(np.float64), b, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=5e-3, atol=5e-3)


def _sym_sparse(rng, n, density=0.1):
    d = (rng.random((n, n)) < density) * rng.uniform(-1, 1, (n, n))
    d = (d + d.T) / 2
    np.fill_diagonal(d, rng.uniform(1, 2, n))
    return d.astype(np.float32)


def test_lanczos_basis_orthonormal_and_tridiagonal(rng):
    n, k = 96, 24
    d = _sym_sparse(rng, n)
    A = CSR.fromdense(d)
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    res = lanczos(A, v0, k)
    V = np.asarray(res.V).astype(np.float64)
    np.testing.assert_allclose(V @ V.T, np.eye(k), atol=5e-3)
    T = V @ d.astype(np.float64) @ V.T
    # V A V^T must be tridiagonal with the returned coefficients
    np.testing.assert_allclose(np.diag(T), np.asarray(res.alphas),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.diag(T, 1), np.asarray(res.betas),
                               rtol=1e-2, atol=5e-3)
    off = T - np.diag(np.diag(T)) - np.diag(np.diag(T, 1), 1) \
        - np.diag(np.diag(T, -1), -1)
    assert np.abs(off).max() < 1e-2


def test_eigsh_lanczos_extremal_eigenvalues(rng):
    n = 128
    d = _sym_sparse(rng, n)
    A = CSR.fromdense(d)
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    theta, Y = eigsh_lanczos(A, v0, k=48)
    w = np.linalg.eigvalsh(d.astype(np.float64))
    assert abs(float(theta[-1]) - w[-1]) < 5e-3 * max(1, abs(w[-1]))
    assert abs(float(theta[0]) - w[0]) < 5e-3 * max(1, abs(w[0]))
    # Ritz vector residual for the top pair: |A y - θ y| small
    y = np.asarray(Y[-1]).astype(np.float64)
    r = d.astype(np.float64) @ y - float(theta[-1]) * y
    assert np.linalg.norm(r) < 1e-2


def test_eigsh_lanczos_jittable(rng):
    n = 64
    d = _sym_sparse(rng, n)
    A = CSR.fromdense(d)
    f = jax.jit(lambda v: eigsh_lanczos(A, v, k=32)[0])
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = np.linalg.eigvalsh(d.astype(np.float64))
    theta = np.asarray(f(v0))
    assert abs(theta[-1] - w[-1]) < 1e-2


def test_lsqr_inconsistent_stops_at_ls_solution(rng):
    """Regression: the ||A^T r|| estimate must include the Givens cosine
    (Paige-Saunders tau = s*c*phibar); without it, inconsistent systems
    run ~5x past the LS solution and report a bogus tiny residual."""
    import scipy.sparse.linalg as spla

    m, n = 120, 40
    d = _sparse_rect(rng, m, n)
    b = rng.uniform(-1, 1, m).astype(np.float32)  # not in range(A)
    res = lsqr(CSR.fromdense(d), jnp.asarray(b), maxiter=200,
               atol=1e-6, btol=1e-6)
    ref = spla.lsqr(d.astype(np.float64), b, atol=1e-6, btol=1e-6)
    # stops in the same regime as scipy (not running to breakdown)
    assert int(res.iters) <= 3 * ref[2] + 5
    # reported residual matches the TRUE |Ax - b| (was 3.5e-7 vs 5.34)
    true_r = np.linalg.norm(d.astype(np.float64) @ np.asarray(res.x) - b)
    assert abs(float(res.residual) - true_r) / true_r < 0.05
    # and the solution is the least-squares solution
    want, *_ = np.linalg.lstsq(d.astype(np.float64), b, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=5e-3, atol=5e-3)
