"""Sparse+sparse union addition and structure validation."""
import jax
import numpy as np
import pytest

from sparsematrix_tpu.formats import COO, CSR, CodebookCSR, validate
from sparsematrix_tpu.ops import sparse_add, sparse_add_apply, sparse_add_plan
from sparsematrix_tpu.utils.testutils import (
    gen_random_dense_sparse,
    gen_sparse_index_matrix,
)


def test_sparse_add(rng):
    a = gen_random_dense_sparse(rng, 30, 40, density=0.15)
    b = gen_random_dense_sparse(rng, 30, 40, density=0.15)
    C = sparse_add(CSR.fromdense(a), CSR.fromdense(b), alpha=2.0, beta=-1.0)
    np.testing.assert_allclose(np.asarray(C.todense()), 2.0 * a - b,
                               rtol=1e-5, atol=1e-3)


def test_sparse_add_plan_reuse(rng):
    a = gen_random_dense_sparse(rng, 20, 20, density=0.2)
    b = gen_random_dense_sparse(rng, 20, 20, density=0.2)
    A, B = CSR.fromdense(a), CSR.fromdense(b)
    plan = sparse_add_plan(A, B)
    f = jax.jit(lambda p, da, db: sparse_add_apply(p, da, db).data)
    d1 = np.asarray(f(plan, A.data, B.data))
    d2 = np.asarray(f(plan, 2 * A.data, B.data))
    A2 = CSR.fromdense(2 * a)
    # same pattern (scaling preserves it): d2 == plan applied to 2a
    want = np.asarray(sparse_add(A2, B).data)
    np.testing.assert_allclose(d2, want, rtol=1e-5, atol=1e-3)


def test_sparse_add_shape_mismatch():
    A = CSR.fromdense(np.eye(3, dtype=np.float32))
    B = CSR.fromdense(np.eye(4, dtype=np.float32))
    with pytest.raises(ValueError):
        sparse_add(A, B)


def test_validate_clean(rng):
    dense = gen_random_dense_sparse(rng, 15, 20, density=0.3)
    assert validate(CSR.fromdense(dense, capacity=200)) == []
    assert validate(COO.fromdense(dense)) == []
    idx, table = gen_sparse_index_matrix(rng, 10, 12, density=0.4, table_size=7)
    assert validate(CodebookCSR.from_index_matrix(idx, table)) == []
    from sparsematrix_tpu.formats import BSR

    assert validate(BSR.fromdense(dense, block_shape=(4, 4))) == []


def test_validate_catches_corruption(rng):
    import dataclasses
    import jax.numpy as jnp

    dense = gen_random_dense_sparse(rng, 10, 10, density=0.3)
    A = CSR.fromdense(dense)
    bad = dataclasses.replace(A, indices=A.indices.at[0].set(99))
    assert any("out of range" in p for p in validate(bad))
    bad2 = dataclasses.replace(A, indptr=A.indptr.at[0].set(5))
    assert validate(bad2)
