"""StripDense (locally-densified banded strips) — format + op tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from sparsematrix_tpu import ops
from sparsematrix_tpu.formats import CSR, StripDense


def _banded(n, offsets, rng, dtype=np.float32):
    mats = [rng.uniform(-10, 10, n - abs(o)).astype(dtype) for o in offsets]
    return sps.diags(mats, offsets, (n, n)).tocsr().astype(dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("n,offsets", [
    (513, (-5, -1, 0, 1, 5)),
    (1000, (-64, -1, 0, 1, 37)),
    (130, (0, 2)),
])
def test_stripdense_roundtrip(rng, n, offsets):
    A = _banded(n, offsets, rng)
    S = StripDense.from_csr(CSR.from_scipy(A))
    np.testing.assert_array_equal(np.asarray(S.todense()), A.toarray())
    assert S.nnz == A.nnz


def test_stripdense_spmv_spmm_match_oracle(rng):
    n = 777
    A = _banded(n, (-33, -2, 0, 1, 40), rng)
    S = StripDense.from_csr(CSR.from_scipy(A))
    x = rng.uniform(-1, 1, n).astype(np.float32)
    X = rng.uniform(-1, 1, (n, 24)).astype(np.float32)
    y = np.asarray(jax.jit(ops.spmv)(S, jnp.asarray(x)))
    Y = np.asarray(jax.jit(ops.spmm)(S, jnp.asarray(X)))
    np.testing.assert_allclose(y, A @ x, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(Y, A @ X, rtol=2e-4, atol=1e-4)


def test_stripdense_block_tridiagonal(rng):
    # block-banded (the TODO-8 workload): 32-wide blocks on a block
    # tridiagonal pattern — every strip's span fits one window
    nb, bs = 24, 32
    n = nb * bs
    blocks = rng.uniform(-1, 1, (3 * nb, bs, bs)).astype(np.float32)
    M = sps.lil_matrix((n, n), dtype=np.float32)
    for i in range(nb):
        for d, j in ((0, i - 1), (1, i), (2, i + 1)):
            if 0 <= j < nb:
                M[i*bs:(i+1)*bs, j*bs:(j+1)*bs] = blocks[3*i + d]
    A = M.tocsr()
    S = StripDense.from_csr(CSR.from_scipy(A))
    assert S.width <= 384  # 3 blocks of 32 cols, 128-rounded
    X = rng.uniform(-1, 1, (n, 16)).astype(np.float32)
    Y = np.asarray(ops.spmm(S, jnp.asarray(X)))
    np.testing.assert_allclose(Y, A @ X, rtol=2e-4, atol=1e-4)


def test_stripdense_rejects_wide_rows(rng):
    n = 512
    A = sps.eye(n, format="lil", dtype=np.float32)
    A[0, n - 1] = 3.0  # one entry makes strip 0 span the whole matrix
    with pytest.raises(ValueError, match="not band-local"):
        StripDense.from_csr(CSR.from_scipy(A.tocsr()), max_width=128)


def test_stripdense_bf16_and_rect(rng):
    n = 260
    A = _banded(n, (-1, 0, 1), rng)[:200, :]  # rectangular (200 x 260)
    S = StripDense.from_csr(CSR.from_scipy(A.tocsr()))
    Sb = S.astype(jnp.bfloat16)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(ops.spmv(Sb, jnp.asarray(x, jnp.bfloat16)))
    np.testing.assert_allclose(
        y.astype(np.float32), A @ x, rtol=0.03, atol=0.05)


def test_prepare_spmv_auto_selects_strip(rng):
    from sparsematrix_tpu.ops.spmv import prepare_spmv

    n = 1024
    A = _banded(n, tuple(range(-40, 41)), rng)  # dense 81-band
    c = CSR.from_scipy(A)
    packed = prepare_spmv(c, layout="auto")
    assert isinstance(packed, StripDense)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(ops.spmv(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=2e-4, atol=1e-4)
    # scattered-random matrices must NOT take the strip path
    import scipy.sparse as sp2
    R = sp2.random(n, n, density=0.02, format="csr",
                   random_state=np.random.RandomState(3), dtype=np.float32)
    packed_r = prepare_spmv(CSR.from_scipy(R), layout="auto")
    assert not isinstance(packed_r, StripDense)
