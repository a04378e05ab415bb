"""GMRES and transposed products."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import COO, CSR
from sparsematrix_tpu.ops import spmv_t, spmm_t
from sparsematrix_tpu.solvers import gmres
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


def _nonsym(rng, n, density=0.1):
    m = ((rng.random((n, n)) < density) * rng.uniform(-1, 1, (n, n))).astype(
        np.float32
    )
    np.fill_diagonal(m, np.abs(m).sum(axis=1) + 1.0)
    return m


@pytest.mark.parametrize("n", [32, 100])
def test_gmres(rng, n):
    a = _nonsym(rng, n)
    A = CSR.fromdense(a)
    b = rng.uniform(-1, 1, n).astype(np.float32)
    res = gmres(A, jnp.asarray(b), tol=1e-6, restart=20, maxiter=20)
    x = np.asarray(res.x)
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-4


def test_gmres_matches_cg_on_spd(rng):
    from sparsematrix_tpu.solvers import cg

    n = 48
    a = _nonsym(rng, n)
    a = (a + a.T) / 2
    np.fill_diagonal(a, np.abs(a).sum(1) + 1)
    A = CSR.fromdense(a.astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    xg = np.asarray(gmres(A, b, tol=1e-8, restart=24, maxiter=30).x)
    xc = np.asarray(cg(A, b, tol=1e-8, maxiter=500).x)
    np.testing.assert_allclose(xg, xc, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("cls", [CSR, COO])
def test_spmv_t(rng, cls):
    dense = gen_random_dense_sparse(rng, 30, 20, density=0.3)
    A = cls.fromdense(dense)
    y = rng.uniform(-1, 1, 30).astype(np.float32)
    got = np.asarray(spmv_t(A, jnp.asarray(y)))
    np.testing.assert_allclose(got, dense.T @ y, rtol=1e-4, atol=1e-3)


def test_spmm_t(rng):
    dense = gen_random_dense_sparse(rng, 25, 18, density=0.3)
    A = CSR.fromdense(dense)
    Y = rng.uniform(-1, 1, (25, 7)).astype(np.float32)
    got = np.asarray(spmm_t(A, jnp.asarray(Y)))
    np.testing.assert_allclose(got, dense.T @ Y, rtol=1e-4, atol=1e-3)


def test_spmv_t_padded_capacity(rng):
    dense = gen_random_dense_sparse(rng, 12, 15, density=0.3)
    A = CSR.fromdense(dense, capacity=200)
    y = rng.uniform(-1, 1, 12).astype(np.float32)
    got = np.asarray(spmv_t(A, jnp.asarray(y)))
    np.testing.assert_allclose(got, dense.T @ y, rtol=1e-4, atol=1e-3)


def test_csr_transpose_device(rng):
    from sparsematrix_tpu.ops import csr_transpose_device

    dense = gen_random_dense_sparse(rng, 37, 53, density=0.2)
    A = CSR.fromdense(dense, capacity=int((dense != 0).sum()) + 7)  # padded
    At = jax.jit(csr_transpose_device)(A)
    assert At.shape == (53, 37)
    np.testing.assert_array_equal(np.asarray(At.todense()), dense.T)
    # round trip
    Att = jax.jit(csr_transpose_device)(At)
    np.testing.assert_array_equal(np.asarray(Att.todense()), dense)
    # spmv over the transposed container matches spmv_t
    y = jnp.asarray(rng.standard_normal(37).astype(np.float32))
    from sparsematrix_tpu.ops import spmv_reference, spmv_t

    np.testing.assert_allclose(np.asarray(spmv_reference(At, y)),
                               np.asarray(spmv_t(A, y)), rtol=1e-5, atol=1e-4)
