"""Wave-batched triangular solve: chain + binv modes vs fp64 oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.trisolve_waves import (
    trisolve_waves_apply,
    trisolve_waves_plan,
)


def _poisson_ilu_L(side):
    """Lower ILU(0) factor of the 2-D Poisson system (the bench case)."""
    from sparsematrix_tpu.ops.ilu import ilu0

    Iq = sps.eye(side)
    T = sps.diags([-1, 4, -1], [-1, 0, 1], (side, side))
    A = (sps.kron(Iq, T)
         + sps.kron(sps.diags([-1, -1], [-1, 1], (side, side)), Iq)).tocsr()
    L, U = ilu0(CSR.from_scipy(A.astype(np.float32)))
    return L, U


def _rand_lower(rng, n, density, band=None, unit=False):
    m = sps.random(n, n, density=density, random_state=7, format="coo",
                   dtype=np.float64)
    keep = m.col < m.row
    if band is not None:
        keep &= (m.row - m.col) <= band
    r, c, v = m.row[keep], m.col[keep], m.data[keep]
    r = np.concatenate([r, np.arange(n)])
    c = np.concatenate([c, np.arange(n)])
    dv = np.ones(n) if unit else rng.uniform(2.0, 4.0, n)
    v = np.concatenate([rng.uniform(-1, 1, keep.sum()), dv])
    sp = sps.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    return sp.astype(np.float32)


def _solve_oracle(sp, b, lower=True, unit=False):
    import scipy.sparse.linalg as spl

    spq = sp.astype(np.float64).tolil()
    if unit:
        spq.setdiag(1.0)
    return spl.spsolve_triangular(spq.tocsr(), b.astype(np.float64),
                                  lower=lower, unit_diagonal=False)


def test_waves_chain_poisson_ilu(rng):
    L, U = _poisson_ilu_L(32)  # n=1024, reach 32 → chain
    b = rng.standard_normal(1024).astype(np.float32)
    plan = trisolve_waves_plan(L, lower=True, unit_diagonal=True)
    assert plan.mode == "chain"
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    want = _solve_oracle(L.to_scipy(), b, lower=True, unit=True)
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=1e-3)
    # and the upper factor
    planU = trisolve_waves_plan(U, lower=False)
    xu = np.asarray(trisolve_waves_apply(planU, jnp.asarray(b)))
    wantu = _solve_oracle(U.to_scipy(), b, lower=False)
    np.testing.assert_allclose(xu, wantu, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("n", [300, 1024, 1300])
def test_waves_chain_banded(rng, n):
    sp = _rand_lower(rng, n, 0.02, band=100)
    plan = trisolve_waves_plan(CSR.from_scipy(sp))
    assert plan.mode == "chain"
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(jax.jit(trisolve_waves_apply)(plan, jnp.asarray(b)))
    np.testing.assert_allclose(x, _solve_oracle(sp, b), rtol=2e-3,
                               atol=1e-3)


@pytest.mark.parametrize("n,m", [(700, 4), (1024, 4), (900, 2)])
def test_waves_binv_general(rng, n, m):
    sp = _rand_lower(rng, n, 0.01)  # unbounded reach → binv
    plan = trisolve_waves_plan(CSR.from_scipy(sp), m=m)
    assert plan.mode == "binv"
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    np.testing.assert_allclose(x, _solve_oracle(sp, b), rtol=2e-3,
                               atol=1e-3)


def test_waves_binv_upper_unit(rng):
    n = 640
    sp = _rand_lower(rng, n, 0.015, unit=True).T.tocsr()  # upper, unit diag
    plan = trisolve_waves_plan(CSR.from_scipy(sp.astype(np.float32)),
                               lower=False, unit_diagonal=True, mode="binv")
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    want = _solve_oracle(sp, b, lower=False, unit=True)
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=1e-3)


def test_waves_vjp_b(rng):
    L, _ = _poisson_ilu_L(16)  # n=256
    n = 256
    plan = trisolve_waves_plan(L, lower=True, unit_diagonal=True,
                               with_transpose=True)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    _, vjp = jax.vjp(lambda bb: trisolve_waves_apply(plan, bb), b)
    (gb,) = vjp(g)
    # ḡ_b = T^{-T} g
    Td = L.to_scipy().astype(np.float64).tolil()
    Td.setdiag(1.0)
    want = np.linalg.solve(Td.toarray().T, np.asarray(g, np.float64))
    np.testing.assert_allclose(np.asarray(gb), want, rtol=2e-3, atol=1e-3)


def test_waves_empty_offdiag(rng):
    n = 200
    d = rng.uniform(1.0, 2.0, n).astype(np.float32)
    sp = sps.diags(d).tocsr().astype(np.float32)
    plan = trisolve_waves_plan(CSR.from_scipy(sp))
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    np.testing.assert_allclose(x, b / d, rtol=1e-5, atol=1e-6)


def test_waves_bf16_smoke(rng):
    sp = _rand_lower(rng, 512, 0.02, band=90)
    plan = trisolve_waves_plan(CSR.from_scipy(sp), dtype=jnp.bfloat16)
    b = rng.standard_normal(512).astype(np.float32)
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    np.testing.assert_allclose(x, _solve_oracle(sp, b), rtol=3e-2,
                               atol=3e-2)


@pytest.mark.parametrize("band", [200, 380])
def test_waves_chain_k_reach(rng, band):
    """Tile reach 2-3 rides the chain-K path (e.g. side-256 Poisson ILU)."""
    n = 1100
    sp = _rand_lower(rng, n, 0.01, band=band)
    plan = trisolve_waves_plan(CSR.from_scipy(sp))
    assert plan.mode == "chain" and plan.K >= 2
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(trisolve_waves_apply(plan, jnp.asarray(b)))
    np.testing.assert_allclose(x, _solve_oracle(sp, b), rtol=2e-3,
                               atol=1e-3)


# ---- multi-RHS -----------------------------------------------------------


def _solve_oracle_mm(sp, B, lower=True, unit=False):
    import scipy.sparse.linalg as spl

    spq = sp.astype(np.float64).tolil()
    if unit:
        spq.setdiag(1.0)
    return spl.spsolve_triangular(spq.tocsr(), B.astype(np.float64),
                                  lower=lower, unit_diagonal=False)


@pytest.mark.parametrize("k", [3, 8, 11])
def test_waves_mm_chain_lower(rng, k):
    from sparsematrix_tpu.kernels.trisolve_waves import \
        trisolve_waves_apply_mm

    L, _ = _poisson_ilu_L(32)
    B = rng.standard_normal((1024, k)).astype(np.float32)
    plan = trisolve_waves_plan(L, lower=True, unit_diagonal=True)
    assert plan.mode == "chain"
    X = np.asarray(trisolve_waves_apply_mm(plan, jnp.asarray(B)))
    want = _solve_oracle_mm(L.to_scipy(), B, lower=True, unit=True)
    np.testing.assert_allclose(X, want, rtol=2e-3, atol=1e-3)
    # columns of the mm solve match the single-RHS engine exactly-ish
    x0 = np.asarray(trisolve_waves_apply(plan, jnp.asarray(B[:, 0])))
    np.testing.assert_allclose(X[:, 0], x0, rtol=1e-5, atol=1e-5)


def test_waves_mm_chain_upper_reversed(rng):
    from sparsematrix_tpu.kernels.trisolve_waves import \
        trisolve_waves_apply_mm

    _, U = _poisson_ilu_L(32)
    B = rng.standard_normal((1024, 8)).astype(np.float32)
    plan = trisolve_waves_plan(U, lower=False, unit_diagonal=False)
    assert plan.mode == "chain" and plan.reversed
    X = np.asarray(trisolve_waves_apply_mm(plan, jnp.asarray(B)))
    want = _solve_oracle_mm(U.to_scipy(), B, lower=False, unit=False)
    np.testing.assert_allclose(X, want, rtol=2e-3, atol=1e-3)


def test_waves_mm_binv_fallback(rng):
    from sparsematrix_tpu.kernels.trisolve_waves import \
        trisolve_waves_apply_mm

    sp = _rand_lower(rng, 640, 0.02)  # random reach → binv
    B = rng.standard_normal((640, 5)).astype(np.float32)
    plan = trisolve_waves_plan(CSR.from_scipy(sp), lower=True, mode="binv",
                               m=2)
    X = np.asarray(trisolve_waves_apply_mm(plan, jnp.asarray(B)))
    want = _solve_oracle_mm(sp, B, lower=True)
    np.testing.assert_allclose(X, want, rtol=2e-3, atol=1e-3)


def test_waves_mm_grad_in_B(rng):
    from sparsematrix_tpu.kernels.trisolve_waves import \
        trisolve_waves_apply_mm

    L, _ = _poisson_ilu_L(16)  # n=256
    plan = trisolve_waves_plan(L, lower=True, unit_diagonal=True,
                               with_transpose=True)
    B = jnp.asarray(rng.standard_normal((256, 4)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((256, 4)).astype(np.float32))

    def loss(Bv):
        return jnp.vdot(W, trisolve_waves_apply_mm(plan, Bv))

    g = np.asarray(jax.grad(loss)(B))
    # analytic: d/dB <W, T^-1 B> = T^-T W
    want = _solve_oracle_mm(L.to_scipy().T, np.asarray(W), lower=False,
                            unit=True)
    np.testing.assert_allclose(g, want, rtol=2e-3, atol=1e-3)


def test_trisolve_op_multi_rhs(rng):
    from sparsematrix_tpu.ops import trisolve

    L, _ = _poisson_ilu_L(16)
    B = rng.standard_normal((256, 6)).astype(np.float32)
    X = np.asarray(trisolve(L, jnp.asarray(B), lower=True,
                            unit_diagonal=True))
    want = _solve_oracle_mm(L.to_scipy(), B, lower=True, unit=True)
    np.testing.assert_allclose(X, want, rtol=2e-3, atol=1e-3)


def test_splu_solve_multi_rhs(rng):
    from sparsematrix_tpu.ops.direct import splu_plans, splu_solve

    n = 320
    sp = (sps.random(n, n, density=0.02, random_state=11, format="csr",
                     dtype=np.float64)
          + sps.diags(rng.uniform(4, 6, n)))
    from sparsematrix_tpu.formats import CSR as _CSR
    solver = splu_plans(_CSR.from_scipy(sp.tocsr().astype(np.float32)))
    B = rng.standard_normal((n, 4)).astype(np.float32)
    X = np.asarray(splu_solve(solver, jnp.asarray(B)))
    import scipy.sparse.linalg as spl
    want = spl.spsolve(sp.tocsc(), B.astype(np.float64))
    np.testing.assert_allclose(X, want, rtol=2e-3, atol=0.5)


# ---- parameter gradients ---------------------------------------------------


@pytest.mark.parametrize("unit", [False, True])
def test_waves_solve_grad_in_vals(rng, unit):
    from sparsematrix_tpu.kernels.trisolve_waves import trisolve_waves_solve

    L, _ = _poisson_ilu_L(16)  # n=256, chain mode
    n = 256
    plan = trisolve_waves_plan(L, lower=True, unit_diagonal=unit,
                               with_grads=True)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    W = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    vals = L.data

    def loss(v, bb):
        return jnp.vdot(W, trisolve_waves_solve(plan, v, bb))

    g_vals, g_b = jax.grad(loss, argnums=(0, 1))(vals, b)

    # independent oracle: dense fp32 triangular solve autodiff
    rows = np.asarray(plan.pat_rows)
    cols = np.asarray(plan.pat_cols)
    cap = vals.shape[0]

    def loss_dense(v):
        # scatter only the real (non-padding) slots
        Td = jnp.zeros((n, n)).at[rows, cols].add(
            jnp.where(jnp.arange(cap) < L.nnz, v, 0.0))
        if unit:
            Td = Td - jnp.diag(jnp.diag(Td)) + jnp.eye(n)
        x = jax.scipy.linalg.solve_triangular(Td, b, lower=True)
        return jnp.vdot(W, x)

    g_dense = jax.grad(loss_dense)(vals)
    # padding + inert-diagonal slots must carry exactly zero cotangent
    scale = np.asarray(plan.pat_scale)
    np.testing.assert_array_equal(np.asarray(g_vals)[scale == 0], 0.0)
    live = scale != 0
    np.testing.assert_allclose(np.asarray(g_vals)[live],
                               np.asarray(g_dense)[live],
                               rtol=2e-3, atol=2e-3)
    # b-gradient = T^-T W
    want_b = _solve_oracle(L.to_scipy().T, np.asarray(W), lower=False,
                           unit=unit)
    np.testing.assert_allclose(np.asarray(g_b), want_b, rtol=2e-3,
                               atol=1e-3)


def test_waves_solve_grad_upper_binv(rng):
    from sparsematrix_tpu.kernels.trisolve_waves import trisolve_waves_solve

    sp = _rand_lower(rng, 384, 0.02).T.tocsr().astype(np.float32)  # upper
    n = 384
    A = CSR.from_scipy(sp)
    plan = trisolve_waves_plan(A, lower=False, mode="binv", m=2,
                               with_grads=True)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    W = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loss(v):
        return jnp.vdot(W, trisolve_waves_solve(plan, v, b))

    g_vals = jax.grad(loss)(A.data)
    rows = np.asarray(plan.pat_rows)
    cols = np.asarray(plan.pat_cols)

    def loss_dense(v):
        Td = jnp.zeros((n, n)).at[rows, cols].add(
            jnp.where(jnp.arange(A.data.shape[0]) < A.nnz, v, 0.0))
        x = jax.scipy.linalg.solve_triangular(Td, b, lower=False)
        return jnp.vdot(W, x)

    g_dense = jax.grad(loss_dense)(A.data)
    live = np.asarray(plan.pat_scale) != 0
    np.testing.assert_allclose(np.asarray(g_vals)[live],
                               np.asarray(g_dense)[live],
                               rtol=2e-3, atol=2e-3)
