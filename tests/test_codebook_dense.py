"""CodebookDense format: decode, spmv/spmm, equivalence with CodebookCSR."""
import jax
import jax.numpy as jnp
import numpy as np

from sparsematrix_tpu.formats import CodebookCSR, CodebookDense
from sparsematrix_tpu.ops import add_mat_mat, spmm, spmv
from sparsematrix_tpu.utils.testutils import (
    gen_matrix_random,
    gen_sparse_index_matrix,
)


def test_decode_matches_codebook_csr(rng):
    idx, table = gen_sparse_index_matrix(rng, 50, 70, density=0.3, table_size=31)
    a = CodebookDense.from_index_matrix(idx, table)
    b = CodebookCSR.from_index_matrix(idx, table)
    np.testing.assert_array_equal(np.asarray(a.todense()),
                                  np.asarray(b.todense()))
    assert a.nnz == b.nnz


def test_spmv_spmm(rng):
    idx, table = gen_sparse_index_matrix(rng, 64, 96, density=0.25, table_size=255)
    A = CodebookDense.from_index_matrix(idx, table)
    dense = np.asarray(A.todense())
    x = gen_matrix_random(rng, 96, 1)[:, 0]
    X = gen_matrix_random(rng, 96, 17)
    np.testing.assert_allclose(
        np.asarray(jax.jit(spmv)(A, jnp.asarray(x))), dense @ x,
        rtol=2e-3, atol=0.5)
    np.testing.assert_allclose(
        np.asarray(jax.jit(spmm)(A, jnp.asarray(X))),
        dense.astype(np.float64) @ X, rtol=2e-3, atol=0.5)


def test_add_mat_mat_with_dense_codebook(rng):
    m, n, k = 13, 40, 60
    a = gen_matrix_random(rng, m, k)
    idx, table = gen_sparse_index_matrix(rng, k, n, density=0.25, table_size=63)
    b_t = CodebookDense.from_index_matrix(idx, table, trans=True)
    b_dense = np.asarray(b_t.todense()).T
    got = np.asarray(add_mat_mat(jnp.asarray(a), b_t, alpha=2.0))
    np.testing.assert_allclose(got, 2.0 * a.astype(np.float64) @ b_dense,
                               rtol=2e-3, atol=0.5)


def test_transpose(rng):
    idx, table = gen_sparse_index_matrix(rng, 10, 20, density=0.5, table_size=7)
    A = CodebookDense.from_index_matrix(idx, table)
    np.testing.assert_array_equal(np.asarray(A.T.todense()),
                                  np.asarray(A.todense()).T)


def test_dense_container(rng):
    from sparsematrix_tpu.formats import CSR, Dense
    from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse

    dense = gen_random_dense_sparse(rng, 48, 64, density=0.3)
    D = Dense.from_sparse(CSR.fromdense(dense))
    assert D.nnz == int((dense != 0).sum())
    x = gen_matrix_random(rng, 64, 1)[:, 0]
    X = gen_matrix_random(rng, 64, 12)
    np.testing.assert_allclose(np.asarray(jax.jit(spmv)(D, jnp.asarray(x))),
                               dense @ x, rtol=2e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(jax.jit(spmm)(D, jnp.asarray(X))),
                               dense.astype(np.float64) @ X, rtol=2e-3, atol=0.5)
    np.testing.assert_array_equal(np.asarray(D.T.todense()), dense.T)
