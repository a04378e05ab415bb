"""Pallas kernels vs jnp reference (interpret mode on CPU).

Kernel-vs-naive property testing, odd shapes included — the strategy of the
reference's kernel_test (/root/reference/src/sparse/kernel_test.cc:27-57).
Compiled-mode equivalence on real TPU is covered by the bench harness.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR, csr_to_blocked_ell
from sparsematrix_tpu.ops import spmm_reference
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


@pytest.mark.parametrize("shape,k", [((64, 256), 128), ((120, 300), 64)])
def test_blocked_ell_spmm_kernel_interpret(rng, shape, k):
    from sparsematrix_tpu.kernels.spmm_pallas import spmm_blocked_ell

    dense = gen_random_dense_sparse(rng, *shape, density=0.1)
    bell = csr_to_blocked_ell(CSR.fromdense(dense), block_shape=(8, 128))
    X = jnp.asarray(rng.uniform(-1, 1, size=(shape[1], k)).astype(np.float32))
    got = np.asarray(spmm_blocked_ell(bell, X))
    want = np.asarray(spmm_reference(bell, X))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("shape,k", [((128, 256), 64), ((96, 300), 128)])
def test_bsr_spmm_kernel_interpret(rng, shape, k):
    from sparsematrix_tpu.formats import csr_to_bsr
    from sparsematrix_tpu.kernels.bsr_pallas import spmm_bsr

    dense = gen_random_dense_sparse(rng, *shape, density=0.05)
    dense[8:16] = 0  # force an empty block row
    A = csr_to_bsr(CSR.fromdense(dense), block_shape=(8, 128))
    X = jnp.asarray(rng.uniform(-1, 1, size=(shape[1], k)).astype(np.float32))
    got = np.asarray(spmm_bsr(A, X))
    want = np.asarray(spmm_reference(A, X))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("mnk", [(29, 200, 300), (8, 128, 256)])
def test_codebook_matmul_kernel_interpret(rng, mnk):
    from sparsematrix_tpu.formats import CodebookDense
    from sparsematrix_tpu.kernels.codebook_pallas import codebook_matmul
    from sparsematrix_tpu.utils.testutils import (
        gen_matrix_random,
        gen_sparse_index_matrix,
    )

    m, n, k = mnk
    a = jnp.asarray(gen_matrix_random(rng, m, k))
    idx, table = gen_sparse_index_matrix(rng, k, n, density=0.25,
                                         table_size=255)
    b_t = CodebookDense.from_index_matrix(idx, table, trans=True)
    got = np.asarray(codebook_matmul(a, b_t))
    want = np.asarray(a).astype(np.float64) @ np.asarray(b_t.todense()).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.5)


def test_bsr_panel_path_matches_grouped(rng):
    """The panel layout (one wide dot per block-row) must equal the
    grouped per-block kernel, including empty block-rows and padding."""
    import numpy as np

    from sparsematrix_tpu.formats import CSR, csr_to_bsr
    from sparsematrix_tpu.kernels.bsr_pallas import (
        _panels_for, pack_bsr_panels, spmm_bsr)

    n = 256
    dense = np.zeros((n, n), np.float32)
    mask = rng.random((n // 8, n // 8)) < 0.08
    mask[3, :] = False  # an empty block-row
    dense = (np.kron(mask, np.ones((8, 8))).astype(np.float32)
             * rng.uniform(-5, 5, (n, n)).astype(np.float32))
    A = csr_to_bsr(CSR.fromdense(dense), block_shape=(8, 8))
    X = rng.uniform(-1, 1, (n, 32)).astype(np.float32)
    got = np.asarray(spmm_bsr(A, jnp.asarray(X)))  # concrete → panel path
    assert _panels_for(A) is not None
    np.testing.assert_allclose(got, dense @ X, rtol=2e-4, atol=1e-4)
    # traced path (grouped kernel) must agree
    import jax

    got_traced = np.asarray(jax.jit(spmm_bsr)(A, jnp.asarray(X)))
    np.testing.assert_allclose(got, got_traced, rtol=1e-5, atol=1e-5)


def test_spmm_dispatch_uses_bsr_panels(rng):
    """ops.spmm on a concrete small-block BSR must reach the panel layout
    (cache populated) and match the oracle."""
    import numpy as np

    from sparsematrix_tpu.formats import CSR, csr_to_bsr
    from sparsematrix_tpu.kernels import bsr_pallas as bp
    from sparsematrix_tpu.ops import spmm

    n = 256
    mask = rng.random((n // 8, n // 8)) < 0.1
    dense = (np.kron(mask, np.ones((8, 8))).astype(np.float32)
             * rng.uniform(-5, 5, (n, n)).astype(np.float32))
    A = csr_to_bsr(CSR.fromdense(dense), block_shape=(8, 8))
    X = rng.uniform(-1, 1, (n, 16)).astype(np.float32)
    bp._PANEL_CACHE.clear()
    from sparsematrix_tpu.config import config

    old = config.kernel_impl
    config.kernel_impl = "pallas"  # CPU: dispatch as the TPU would
    try:
        Y = np.asarray(spmm(A, jnp.asarray(X), method="sparse"))
    finally:
        config.kernel_impl = old
    assert len(bp._PANEL_CACHE) == 1, "panel layout not engaged"
    np.testing.assert_allclose(Y, dense @ X, rtol=2e-4, atol=1e-4)
