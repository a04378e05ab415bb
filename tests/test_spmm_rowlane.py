"""Row-lane SpMM kernel vs oracle (interpret on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_rowlane import pack_sell_rowlane
from sparsematrix_tpu.kernels.spmm_rowlane import spmm_rowlane
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


@pytest.mark.parametrize("shape,density,k", [
    ((96, 1024), 0.05, 8),
    ((200, 2048), 0.02, 16),
    ((130, 1500), 0.03, 4),   # odd rows/cols
])
def test_spmm_rowlane_matches_oracle(rng, shape, density, k):
    dense = gen_random_dense_sparse(rng, *shape, density=density)
    packed = pack_sell_rowlane(CSR.fromdense(dense), group=4)
    X = rng.standard_normal((shape[1], k)).astype(np.float32)
    got = np.asarray(spmm_rowlane(packed, jnp.asarray(X)))
    want = dense.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_spmm_rowlane_rejects_multilane_pack(rng):
    dense = gen_random_dense_sparse(rng, 64, 512, density=0.1)
    p = pack_sell_rowlane(CSR.fromdense(dense), lanes_per_row=2)
    with pytest.raises(ValueError):
        spmm_rowlane(p, jnp.zeros((512, 4), jnp.float32))


def test_spmm_auto_dispatches_rowlane(rng, monkeypatch):
    from sparsematrix_tpu.config import config as cfg
    from sparsematrix_tpu.ops import spmm

    monkeypatch.setattr(cfg, "kernel_impl", "pallas")
    dense = gen_random_dense_sparse(rng, 256, 2048, density=0.02)  # <5%
    A = CSR.fromdense(dense)
    X = jnp.asarray(rng.standard_normal((2048, 16)).astype(np.float32))
    got = np.asarray(spmm(A, X))
    np.testing.assert_allclose(got, dense.astype(np.float64) @ np.asarray(X),
                               rtol=2e-3, atol=0.5)


def test_spmm_dualgather_matches(rng):
    from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

    n, k = 1024, 24
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    packed = pack_dualgather(CSR.fromdense(dense), k_tiles=1)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = np.asarray(spmm_dualgather(packed, jnp.asarray(X)))
    np.testing.assert_allclose(Y, dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


def test_spmm_dualgather_rect_odd(rng):
    from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

    rows, cols, k = 700, 1300, 7
    dense = gen_random_dense_sparse(rng, rows, cols, density=0.03)
    packed = pack_dualgather(CSR.fromdense(dense), k_tiles=1)
    X = rng.standard_normal((cols, k)).astype(np.float32)
    Y = np.asarray(jax.jit(spmm_dualgather)(packed, jnp.asarray(X)))
    np.testing.assert_allclose(Y, dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


def test_spmm_auto_routes_dualgather_walk(rng, monkeypatch):
    # low-density CSR, k<=64, concrete matrix: auto must hit the walk
    from sparsematrix_tpu.config import config as cfg
    from sparsematrix_tpu.ops import spmm

    monkeypatch.setattr(cfg, "kernel_impl", "pallas")  # dispatch as on TPU

    n, k = 2048, 16
    dense = gen_random_dense_sparse(rng, n, n, density=0.01)
    A = CSR.fromdense(dense)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    np.testing.assert_allclose(Y, dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)
    from sparsematrix_tpu.ops.spmm import _DG_CACHE

    assert any(e[0]() is A for e in _DG_CACHE.values())
