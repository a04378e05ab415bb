"""Triangular solve and ILU(0) vs scipy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops import (
    ilu0,
    ilu0_plans,
    ilu_apply,
    spmv,
    trisolve,
    trisolve_apply,
    trisolve_plan,
)


def _rand_lower(rng, n, density=0.2, unit=False):
    m = np.tril(rng.uniform(-1, 1, (n, n)) * (rng.random((n, n)) < density), -1)
    d = np.ones(n) if unit else rng.uniform(1.0, 2.0, n)
    return (m + np.diag(d)).astype(np.float32)


@pytest.mark.parametrize("n", [16, 64, 150])
def test_trisolve_lower(rng, n):
    L = _rand_lower(rng, n)
    b = rng.uniform(-1, 1, n).astype(np.float32)
    x = np.asarray(trisolve(CSR.fromdense(L), jnp.asarray(b), lower=True))
    oracle = spla.spsolve_triangular(sp.csr_matrix(L), b, lower=True)
    np.testing.assert_allclose(x, oracle, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n", [16, 100])
def test_trisolve_upper(rng, n):
    U = _rand_lower(rng, n).T.copy()
    b = rng.uniform(-1, 1, n).astype(np.float32)
    x = np.asarray(trisolve(CSR.fromdense(U), jnp.asarray(b), lower=False))
    oracle = spla.spsolve_triangular(sp.csr_matrix(U), b, lower=False)
    np.testing.assert_allclose(x, oracle, rtol=1e-3, atol=1e-3)


def test_trisolve_plan_jit_reuse(rng):
    n = 40
    L = _rand_lower(rng, n)
    plan = trisolve_plan(CSR.fromdense(L), lower=True)
    f = jax.jit(trisolve_apply)
    b1 = rng.uniform(-1, 1, n).astype(np.float32)
    b2 = rng.uniform(-1, 1, n).astype(np.float32)
    for b in (b1, b2):
        x = np.asarray(f(plan, jnp.asarray(b)))
        np.testing.assert_allclose(L @ x, b, rtol=1e-3, atol=1e-3)


def test_trisolve_diagonal_matrix(rng):
    d = rng.uniform(1, 2, 8).astype(np.float32)
    A = CSR.fromdense(np.diag(d))
    b = rng.uniform(-1, 1, 8).astype(np.float32)
    x = np.asarray(trisolve(A, jnp.asarray(b)))
    np.testing.assert_allclose(x, b / d, rtol=1e-5)


def test_trisolve_zero_diag_raises(rng):
    m = np.eye(4, dtype=np.float32)
    m[2, 2] = 0.0
    with pytest.raises(ValueError):
        trisolve_plan(CSR.fromdense(m))


def _spd_banded(rng, n, density=0.15):
    """Diagonally dominant sparse matrix (ILU-friendly)."""
    m = (rng.random((n, n)) < density) * rng.uniform(-1, 1, (n, n))
    m = m.astype(np.float32)
    np.fill_diagonal(m, np.abs(m).sum(axis=1) + 1.0)
    return m


@pytest.mark.parametrize("n", [24, 80])
def test_ilu0_factors_match_on_pattern(rng, n):
    """On A's pattern, (L@U) must equal A wherever A is nonzero."""
    a = _spd_banded(rng, n)
    A = CSR.fromdense(a)
    L, U = ilu0(A)
    lu = np.asarray(L.todense()).astype(np.float64) @ np.asarray(U.todense())
    mask = a != 0
    np.testing.assert_allclose(lu[mask], a[mask], rtol=1e-3, atol=1e-3)


def test_ilu0_preconditioner_reduces_residual(rng):
    n = 60
    a = _spd_banded(rng, n, density=0.1)
    A = CSR.fromdense(a)
    plans = ilu0_plans(A)
    b = rng.uniform(-1, 1, n).astype(np.float32)
    x = np.asarray(ilu_apply(plans, jnp.asarray(b)))
    # M x = b with M ≈ A → residual of A x vs b much smaller than |b|
    res = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert res < 0.5, res


def test_ilu0_exact_when_pattern_full_tri(rng):
    """If A's pattern admits exact LU (e.g. tridiagonal), ILU(0) == LU and
    the preconditioner solves exactly."""
    n = 50
    d = rng.uniform(2, 3, n)
    e = rng.uniform(-1, 1, n - 1)
    a = (np.diag(d) + np.diag(e, -1) + np.diag(e, 1)).astype(np.float32)
    A = CSR.fromdense(a)
    plans = ilu0_plans(A)
    b = rng.uniform(-1, 1, n).astype(np.float32)
    x = np.asarray(ilu_apply(plans, jnp.asarray(b)))
    np.testing.assert_allclose(a @ x, b, rtol=1e-2, atol=1e-2)


def test_ilu0_native_matches_python_bit_exact(rng):
    """Native C++ IKJ vs the Python walk — bit-exact (the reference's
    optimized-vs-naive lesson, SURVEY §6)."""
    import pytest
    import scipy.sparse as sps

    from sparsematrix_tpu import native
    from sparsematrix_tpu.ops import ilu as ilu_mod

    if native.get_lib() is None:
        pytest.skip("native codec unavailable")
    n = 400
    d = sps.random(n, n, density=0.02, random_state=3, format="csr",
                   dtype=np.float64)
    d = d + sps.eye(n, format="csr") * 25.0
    d.sort_indices()
    a1 = np.ascontiguousarray(d.data, np.float64).copy()
    assert ilu_mod._ilu0_factor_native(d.indptr, d.indices, a1, n)
    a2 = d.data.astype(np.float64).copy()
    ilu_mod._ilu0_factor_python(d.indptr, d.indices, a2, n)
    np.testing.assert_array_equal(a1, a2)
