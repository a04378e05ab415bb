"""Hybrid skew SpMV layout (ops/skew.py): auto routing, correctness on
power-law structures, and the differentiable composition."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsematrix_tpu.bench.suite import gen_zipf_csr
from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops.skew import SkewSpmv, pack_skew, spmv_skew
from sparsematrix_tpu.ops.spmv import prepare_spmv, spmv


@pytest.fixture
def rng():
    return np.random.default_rng(5)


@pytest.mark.parametrize("col_zipf", [False, True])
def test_skew_auto_route_and_oracle(rng, col_zipf):
    n = 8192
    sp = gen_zipf_csr(3, n, n, n * 64, col_zipf=col_zipf)
    A = CSR.from_scipy(sp)
    pk = prepare_spmv(A)
    assert isinstance(pk, SkewSpmv)
    # the fill collapse is repaired: degree-sorted base packs well
    assert pk.fill_rate > 0.2
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(jax.jit(spmv)(pk, jnp.asarray(x)))
    want = sp.astype(np.float64) @ x
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=0.5)


def test_skew_not_engaged_on_uniform(rng):
    import scipy.sparse as sps

    sp = sps.random(8192, 8192, density=0.004, random_state=1,
                    format="csr", dtype=np.float32)
    pk = prepare_spmv(CSR.from_scipy(sp))
    assert not isinstance(pk, SkewSpmv)


def test_skew_vjp(rng):
    n = 4096
    sp = gen_zipf_csr(4, n, n, n * 32)
    sp.data = rng.uniform(-2, 2, sp.nnz).astype(np.float32)
    pk = pack_skew(CSR.from_scipy(sp))
    x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    gx = jax.grad(lambda xx: (spmv_skew(pk, xx) * w).sum())(x)
    want = sp.T.astype(np.float64) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)


def test_skew_rect_and_empty_hub(rng):
    # rectangular, no hubs above threshold → pure base + perm path
    import scipy.sparse as sps

    sp = gen_zipf_csr(6, 5000, 3000, 60_000)
    pk = pack_skew(CSR.from_scipy(sp))
    x = rng.uniform(-1, 1, 3000).astype(np.float32)
    y = np.asarray(spmv_skew(pk, jnp.asarray(x)))
    want = sp.astype(np.float64) @ x
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=0.5)


def test_skew_through_cg_solver(rng):
    """A Zipf SPD system solved through cg with the auto skew pack
    (prepare_spmv inside the solver path)."""
    import scipy.sparse as sps

    from sparsematrix_tpu.solvers import cg

    n = 4096
    base = gen_zipf_csr(8, n, n, n * 24)
    # SPD: A = B B^T + n I (keeps the zipf hub structure in B)
    spd = (base @ base.T).tocsr()
    spd = (spd + spd.T) * 0.5 + sps.identity(n) * (
        abs(spd).sum(axis=1).max() + 1.0)
    spd = sps.csr_matrix(spd, dtype=np.float32)
    A = CSR.from_scipy(spd)
    pk = prepare_spmv(A)
    b = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    sol = cg(pk, b, tol=1e-6, maxiter=2000)
    x = np.asarray(sol.x)
    res = np.linalg.norm(spd.astype(np.float64) @ x - np.asarray(b))
    assert res <= 1e-4 * np.linalg.norm(np.asarray(b))


def test_skew_all_rows_hub(rng):
    """Degenerate all-hub matrix keeps a well-formed base + permutation."""
    d = rng.uniform(-1, 1, (128, 256)).astype(np.float32)
    A = CSR.fromdense(jnp.asarray(d))
    pk = pack_skew(A)
    x = rng.uniform(-1, 1, 256).astype(np.float32)
    y = np.asarray(spmv_skew(pk, jnp.asarray(x)))
    np.testing.assert_allclose(y, d.astype(np.float64) @ x, rtol=2e-3,
                               atol=0.5)


# ---------------------------------------------------------------------------
# round-5 late: multi-RHS over the hybrid layout (TODO_ROUND6 §6)


@pytest.mark.parametrize("col_zipf", [False, True])
def test_skew_spmm_oracle(rng, col_zipf):
    from sparsematrix_tpu.ops.skew import spmm_skew
    from sparsematrix_tpu.ops.spmm import spmm

    n, k = 8192, 8
    sp = gen_zipf_csr(3, n, n, n * 64, col_zipf=col_zipf)
    pk = prepare_spmv(CSR.from_scipy(sp))
    assert isinstance(pk, SkewSpmv)
    X = rng.uniform(-1, 1, (n, k)).astype(np.float32)
    got = np.asarray(jax.jit(spmm)(pk, jnp.asarray(X)))
    want = sp.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    # the direct entry point agrees
    got2 = np.asarray(spmm_skew(pk, jnp.asarray(X)))
    np.testing.assert_allclose(got2, got, rtol=1e-6, atol=1e-6)


def test_skew_spmm_auto_route_from_csr(rng):
    """ops.spmm on a raw power-law CSR routes through the skew pack."""
    import importlib

    spmm_mod = importlib.import_module("sparsematrix_tpu.ops.spmm")

    n, k = 8192, 16
    sp = gen_zipf_csr(9, n, n, n * 24, col_zipf=True)
    A = CSR.from_scipy(sp)
    X = rng.uniform(-1, 1, (n, k)).astype(np.float32)
    got = np.asarray(spmm_mod.spmm(A, jnp.asarray(X)))
    want = sp.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    cached = spmm_mod._dg_pack_of(A)
    assert isinstance(cached, SkewSpmv)


def test_skew_spmm_walk_fallback_base(rng):
    """Base layouts without a matrix kernel (rowlane superblock) ride
    the per-column lax.map walk in _base_spmm."""
    from sparsematrix_tpu.kernels.spmv_superblock import SellSuperblock
    from sparsematrix_tpu.ops.skew import spmm_skew

    n, k = 4096, 4
    sp = gen_zipf_csr(4, n, n, n * 16)
    pk = pack_skew(CSR.from_scipy(sp), layout="superblock")
    assert isinstance(pk.base, SellSuperblock)
    X = rng.uniform(-1, 1, (n, k)).astype(np.float32)
    got = np.asarray(spmm_skew(pk, jnp.asarray(X)))
    want = sp.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_skew_spmm_vjp(rng):
    from sparsematrix_tpu.ops.skew import spmm_skew

    n, k = 4096, 4
    sp = gen_zipf_csr(7, n, n, n * 32)
    pk = pack_skew(CSR.from_scipy(sp))
    X = jnp.asarray(rng.uniform(-1, 1, (n, k)).astype(np.float32))
    W = jnp.asarray(rng.uniform(-1, 1, (n, k)).astype(np.float32))
    gX = jax.grad(lambda xx: (spmm_skew(pk, xx) * W).sum())(X)
    want = sp.T.astype(np.float64) @ np.asarray(W, np.float64)
    np.testing.assert_allclose(np.asarray(gX), want, rtol=2e-3, atol=0.5)


def test_prepare_spmv_layout_skew_explicit(rng):
    """layout="skew" reaches pack_skew (was dead code behind the
    unknown-layout guard)."""
    sp = gen_zipf_csr(5, 2048, 2048, 2048 * 8)
    pk = prepare_spmv(CSR.from_scipy(sp), layout="skew")
    assert isinstance(pk, SkewSpmv)
