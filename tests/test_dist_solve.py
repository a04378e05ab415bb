"""Distributed CG on the simulated 8-device CPU mesh.

The whole iteration runs inside one shard_map region (one all_gather + two
scalar psums per step); validated against the single-device solver and a
scipy direct solve.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.parallel import (
    dist_bicgstab,
    dist_cg,
    dist_gmres,
    make_mesh,
    partition_csr_rows,
    shard_partitioned,
)
from sparsematrix_tpu.solvers import bicgstab, cg


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(8)


def _poisson(side):
    I = sp.eye(side)
    T = sp.diags([-1.0, 4.0, -1.0], [-1, 0, 1], (side, side))
    return (sp.kron(I, T)
            + sp.kron(sp.diags([-1.0, -1.0], [-1, 1], (side, side)),
                      I)).tocsr()


@pytest.mark.parametrize("side", [12, 17])  # 144 and 289 rows (odd band)
def test_dist_cg_matches_direct(rng, mesh, side):
    P = _poisson(side).astype(np.float32)
    A = CSR.from_scipy(P)
    n = P.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    res = dist_cg(part, b, mesh, tol=1e-6, maxiter=500)
    want = sp.linalg.spsolve(P.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-3, atol=1e-3)
    assert int(res.iters) < 500


def test_dist_cg_jacobi_preconditioned(rng, mesh):
    # scaled Poisson: wildly varying diagonal makes Jacobi genuinely help
    P = _poisson(16)
    s = 1.0 + 9.0 * rng.random(P.shape[0])
    D = sp.diags(s)
    Ps = (D @ P @ D).tocsr().astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    plain = dist_cg(part, b, mesh, tol=1e-5, maxiter=800)
    jac = dist_cg(part, b, mesh, precond="jacobi", tol=1e-5, maxiter=800)
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(jac.x), want, rtol=2e-3, atol=2e-3)
    assert int(jac.iters) <= int(plain.iters)


def test_dist_cg_matches_single_device(rng, mesh):
    P = _poisson(12).astype(np.float32)
    A = CSR.from_scipy(P)
    n = P.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    d = dist_cg(part, b, mesh, tol=1e-6, maxiter=400)
    s = cg(A, b, tol=1e-6, maxiter=400)
    np.testing.assert_allclose(np.asarray(d.x), np.asarray(s.x),
                               rtol=1e-3, atol=1e-3)


def test_dist_cg_jit_compiles(rng, mesh):
    P = _poisson(12).astype(np.float32)
    A = CSR.from_scipy(P)
    n = P.shape[0]
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    f = jax.jit(functools.partial(dist_cg, part, mesh=mesh, tol=1e-6,
                                  maxiter=300))
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    res = f(b)
    rnorm = np.linalg.norm(
        P.astype(np.float64) @ np.asarray(res.x, np.float64)
        - np.asarray(b, np.float64)) / np.linalg.norm(np.asarray(b))
    assert rnorm < 1e-4


def _convdiff(side, rng):
    """Nonsymmetric convection-diffusion operator (BiCGSTAB/GMRES fodder)."""
    P = _poisson(side)
    n = P.shape[0]
    C = sp.diags([0.4, -0.4], [1, -1], (n, n))  # skew convection term
    return (P + C).tocsr()


@pytest.mark.parametrize("side", [12, 17])
def test_dist_bicgstab_matches_direct(rng, mesh, side):
    Ps = _convdiff(side, rng).astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    res = dist_bicgstab(part, b, mesh, tol=1e-6, maxiter=800)
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=2e-3, atol=2e-3)
    assert int(res.iters) < 800


def test_dist_bicgstab_jacobi_helps(rng, mesh):
    Ps = _convdiff(16, rng)
    s = 1.0 + 9.0 * rng.random(Ps.shape[0])
    D = sp.diags(s)
    Ps = (D @ Ps @ D).tocsr().astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    jac = dist_bicgstab(part, b, mesh, precond="jacobi", tol=1e-5,
                        maxiter=1500)
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(jac.x), want, rtol=5e-3, atol=5e-3)


def test_dist_bicgstab_matches_single_device(rng, mesh):
    Ps = _convdiff(12, rng).astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    d = dist_bicgstab(part, b, mesh, tol=1e-6, maxiter=600)
    s = bicgstab(A, b, tol=1e-6, maxiter=600)
    # same algorithm, different reduction order — compare both to truth
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(d.x), want, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s.x), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("side", [12, 17])
def test_dist_gmres_matches_direct(rng, mesh, side):
    Ps = _convdiff(side, rng).astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    res = dist_gmres(part, b, mesh, tol=1e-6, restart=30, maxiter=40)
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=2e-3, atol=2e-3)
    assert int(res.iters) < 30 * 40


def test_dist_gmres_jacobi_preconditioned(rng, mesh):
    Ps = _convdiff(14, rng)
    s = 1.0 + 9.0 * rng.random(Ps.shape[0])
    D = sp.diags(s)
    Ps = (D @ Ps @ D).tocsr().astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    plain = dist_gmres(part, b, mesh, tol=1e-5, restart=25, maxiter=60)
    jac = dist_gmres(part, b, mesh, precond="jacobi", tol=1e-5, restart=25,
                     maxiter=60)
    want = sp.linalg.spsolve(Ps.astype(np.float64).tocsc(),
                             np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(jac.x), want, rtol=5e-3, atol=5e-3)
    assert int(jac.iters) <= int(plain.iters)


def test_dist_gmres_jit_compiles(rng, mesh):
    Ps = _convdiff(12, rng).astype(np.float32)
    A = CSR.from_scipy(Ps)
    n = Ps.shape[0]
    part = shard_partitioned(partition_csr_rows(A, 8), mesh)
    f = jax.jit(functools.partial(dist_gmres, part, mesh=mesh, tol=1e-6,
                                  restart=25, maxiter=40))
    b = jnp.asarray(rng.uniform(-1, 1, (n,)), dtype=jnp.float32)
    res = f(b)
    rnorm = np.linalg.norm(
        Ps.astype(np.float64) @ np.asarray(res.x, np.float64)
        - np.asarray(b, np.float64)) / np.linalg.norm(np.asarray(b))
    assert rnorm < 1e-4


def test_dist_gmres_rejects_bad_restart(rng, mesh):
    P = _poisson(8).astype(np.float32)
    part = shard_partitioned(partition_csr_rows(CSR.from_scipy(P), 8), mesh)
    with pytest.raises(ValueError, match="restart"):
        dist_gmres(part, jnp.zeros(P.shape[0], jnp.float32), mesh, restart=0)


def test_dist_cg_rejects_col_partition(rng, mesh):
    from sparsematrix_tpu.parallel import partition_csr_cols

    P = _poisson(8).astype(np.float32)
    part = partition_csr_cols(CSR.from_scipy(P), 8)
    with pytest.raises(ValueError):
        dist_cg(part, jnp.zeros(P.shape[0], jnp.float32), mesh)


def test_dist_cg_rejects_rectangular(rng, mesh):
    from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse

    d = gen_random_dense_sparse(rng, 64, 96, density=0.2)
    part = shard_partitioned(partition_csr_rows(CSR.fromdense(d), 8), mesh)
    with pytest.raises(ValueError, match="square"):
        dist_cg(part, jnp.zeros(64, jnp.float32), mesh)
