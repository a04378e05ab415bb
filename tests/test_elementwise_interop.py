"""Elementwise ops and BCOO/torch interop."""
import numpy as np
import pytest

from sparsematrix_tpu.formats import COO, CSR
from sparsematrix_tpu.formats.interop import from_bcoo, from_torch, to_bcoo, to_torch
from sparsematrix_tpu.ops.elementwise import (
    axpy_same_pattern,
    diagonal,
    frobenius_norm,
    scale,
)
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


def test_scale_and_axpy(rng):
    dense = gen_random_dense_sparse(rng, 20, 20, density=0.3)
    A = CSR.fromdense(dense)
    np.testing.assert_allclose(np.asarray(scale(A, 2.5).todense()),
                               2.5 * dense, rtol=1e-6)
    B = scale(A, -1.0)
    Z = axpy_same_pattern(1.0, A, B)
    np.testing.assert_allclose(np.asarray(Z.todense()), np.zeros_like(dense),
                               atol=1e-6)


def test_diagonal_and_norm(rng):
    dense = gen_random_dense_sparse(rng, 25, 25, density=0.3)
    A = CSR.fromdense(dense)
    np.testing.assert_allclose(np.asarray(diagonal(A)), np.diag(dense),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(frobenius_norm(A)),
                               np.linalg.norm(dense), rtol=1e-5)


def test_bcoo_roundtrip(rng):
    dense = gen_random_dense_sparse(rng, 15, 22, density=0.25)
    A = COO.fromdense(dense)
    b = to_bcoo(A)
    back = from_bcoo(b)
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)


def test_torch_roundtrip(rng):
    torch = pytest.importorskip("torch")
    dense = gen_random_dense_sparse(rng, 18, 14, density=0.3)
    A = CSR.fromdense(dense)
    t = to_torch(A)
    back = from_torch(t)
    np.testing.assert_allclose(np.asarray(back.todense()), dense, rtol=1e-6)
