"""Superblock row-lane SpMV: correctness vs dense oracle, regrouping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_superblock import (
    pack_superblock,
    spmv_superblock,
)
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


@pytest.mark.parametrize("n,density", [(300, 0.05), (1024, 0.02),
                                       (2048, 0.005)])
def test_superblock_matches_dense(rng, n, density):
    d = gen_random_dense_sparse(rng, n, n, density=density)
    A = CSR.fromdense(d)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    packed = pack_superblock(A, group=8, k_tiles=8)
    y = np.asarray(jax.jit(spmv_superblock)(packed, jnp.asarray(x)))
    want = d.astype(np.float64) @ x
    np.testing.assert_allclose(y, want, rtol=2e-3, atol=0.5)


def test_superblock_rect_and_params(rng):
    d = gen_random_dense_sparse(rng, 500, 1300, density=0.03)
    A = CSR.fromdense(d)
    x = rng.uniform(-1, 1, 1300).astype(np.float32)
    for group, k in ((4, 4), (16, 16), (2, 32)):
        packed = pack_superblock(A, group=group, k_tiles=k)
        y = np.asarray(spmv_superblock(packed, jnp.asarray(x)))
        np.testing.assert_allclose(y, d.astype(np.float64) @ x,
                                   rtol=2e-3, atol=0.5)


def test_superblock_empty_rows_and_tiny(rng):
    d = np.zeros((260, 260), np.float32)
    d[0, 5] = 2.0
    d[259, 0] = -3.0
    A = CSR.fromdense(d)
    x = rng.uniform(-1, 1, 260).astype(np.float32)
    packed = pack_superblock(A, group=4, k_tiles=4)
    y = np.asarray(spmv_superblock(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, d @ x, rtol=1e-4, atol=1e-4)


def test_superblock_bf16_storage(rng):
    d = gen_random_dense_sparse(rng, 512, 512, density=0.03)
    A = CSR.fromdense(d)
    x = rng.uniform(-1, 1, 512).astype(np.float32)
    packed = pack_superblock(A, group=8, k_tiles=8, dtype=jnp.bfloat16)
    assert packed.vals.dtype == jnp.bfloat16
    y = np.asarray(spmv_superblock(packed, jnp.asarray(x)))
    ref = (d.astype(jnp.bfloat16).astype(np.float64)) @ x
    np.testing.assert_allclose(y, ref, rtol=2e-2, atol=2.0)


def test_prepare_spmv_auto_clustered_octet(rng):
    # clustered low-degree structure: many 128-row tiles whose ~1.2
    # entries/row all land in one 1024-column window.  Round-4 codified
    # dual-gather here on an UNMEASURED claim; the round-5 on-chip race
    # (benchmarks/probe_route_clustered.py, bench group spmv_clustered)
    # measured octet 13.5 µs vs dual-gather 18.4 µs on this exact
    # generator — the nnz ≤ 2·rows auto rule needs no locality carve-out.
    import scipy.sparse as sps

    n_tiles, n = 512, 512 * 128
    rows = rng.integers(0, n, size=80_000)
    cols = rng.integers(0, 1024, size=rows.size)
    vals = rng.uniform(-1, 1, rows.size).astype(np.float32)
    d = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    d.sum_duplicates()
    A = CSR.from_scipy(d)
    from sparsematrix_tpu.kernels.spmv_octet import Octet
    from sparsematrix_tpu.ops.spmv import prepare_spmv, spmv

    packed = prepare_spmv(A)
    assert isinstance(packed, Octet)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(jax.jit(spmv)(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, d.astype(np.float64) @ x, rtol=2e-3,
                               atol=0.5)


def test_prepare_spmv_auto_dense_rows_dualgather(rng):
    # ~100 nnz/row unstructured: dual-gather is the measured-best layout
    # at every unstructured density (BASELINE.md csr_spmv_xl)
    n = 2048
    d = gen_random_dense_sparse(rng, n, n, density=0.05)  # ~100 nnz/row
    from sparsematrix_tpu.kernels.spmv_dualgather import DualGather
    from sparsematrix_tpu.ops.spmv import prepare_spmv

    packed = prepare_spmv(CSR.fromdense(d))
    assert isinstance(packed, DualGather)


def test_superblock_grad_in_x(rng):
    n = 600
    d = gen_random_dense_sparse(rng, n, n, density=0.02)
    A = CSR.fromdense(d)
    packed = pack_superblock(A, group=8, k_tiles=8)
    w = rng.standard_normal(n).astype(np.float32)

    def loss(x):
        return jnp.vdot(jnp.asarray(w), spmv_superblock(packed, x))

    x = rng.uniform(-1, 1, n).astype(np.float32)
    g = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    want = d.astype(np.float64).T @ w  # d(w·Ax)/dx = A^T w
    np.testing.assert_allclose(g, want, rtol=2e-3, atol=0.5)


def test_auto_pack_dispatches_superblock(rng, monkeypatch):
    """spmv(CSR) on the pallas path must dispatch whichever container the
    auto-pack selected (regression: superblock pack fed to the rowlane
    kernel)."""
    import scipy.sparse as sps

    import importlib

    spmv_mod = importlib.import_module("sparsematrix_tpu.ops.spmv")
    from sparsematrix_tpu.config import config as config_obj

    n_tiles, n = 512, 512 * 128
    rows = rng.integers(0, n, size=80_000)
    cols = rng.integers(0, 1024, size=rows.size)
    vals = rng.uniform(-1, 1, rows.size).astype(np.float32)
    d = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    d.sum_duplicates()
    A = CSR.from_scipy(d)
    monkeypatch.setattr(config_obj, "kernel_impl", "pallas",
                        raising=False)
    monkeypatch.setattr(spmv_mod, "_AUTO_PACK_MIN_NNZ", 0, raising=False)
    monkeypatch.setattr(spmv_mod, "_AUTO_PACK_MIN_NNZ_PER_ROW", 0,
                        raising=False)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(spmv_mod.spmv(A, jnp.asarray(x)))
    np.testing.assert_allclose(y, d.astype(np.float64) @ x, rtol=2e-3,
                               atol=0.5)
