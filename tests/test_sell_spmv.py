"""SELL lane-bucketed SpMV kernel vs jnp reference (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_pallas import pack_sell, spmv_sell
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


@pytest.mark.parametrize("n,d,tr", [(512, 0.05, 32), (1000, 0.02, 16),
                                    (300, 0.2, 8), (130, 0.1, 64)])
def test_sell_spmv_random(rng, n, d, tr):
    dense = gen_random_dense_sparse(rng, n, n, density=d)
    A = CSR.fromdense(dense)
    packed = pack_sell(A, tr=tr)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(spmv_sell(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=0.5)


def test_sell_spmv_rectangular(rng):
    dense = gen_random_dense_sparse(rng, 100, 2500, density=0.01)
    A = CSR.fromdense(dense)
    packed = pack_sell(A, tr=32)
    x = rng.uniform(-1, 1, 2500).astype(np.float32)
    y = np.asarray(spmv_sell(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=0.5)


def test_sell_spmv_empty_tiles(rng):
    dense = np.zeros((200, 200), dtype=np.float32)
    dense[5, 7] = 3.0
    dense[150, 199] = -2.0  # tiles in between have no entries
    A = CSR.fromdense(dense)
    packed = pack_sell(A, tr=16)
    x = np.arange(200, dtype=np.float32)
    y = np.asarray(spmv_sell(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, atol=1e-5)


def test_sell_spmv_zero_matrix():
    A = CSR.fromdense(np.zeros((32, 32), dtype=np.float32))
    packed = pack_sell(A, tr=8)
    y = np.asarray(spmv_sell(packed, jnp.ones(32, jnp.float32)))
    np.testing.assert_array_equal(y, np.zeros(32))


def test_sell_deep_lane_buckets(rng):
    """Columns concentrated in one lane → multiple slabs per bucket."""
    dense = np.zeros((16, 256), dtype=np.float32)
    dense[:, 128] = rng.uniform(1, 2, 16)  # all in lane 0 of window 0... lane 0
    dense[:, 0] = rng.uniform(1, 2, 16)
    A = CSR.fromdense(dense)
    packed = pack_sell(A, tr=16)
    x = rng.uniform(-1, 1, 256).astype(np.float32)
    y = np.asarray(spmv_sell(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("n,d,g", [(512, 0.05, 4), (1024, 0.02, 8),
                                   (300, 0.3, 2)])
def test_rowpure_spmv_random(rng, n, d, g):
    from sparsematrix_tpu.kernels.spmv_pallas import (
        pack_sell_rowpure,
        spmv_sell_rowpure,
    )

    dense = gen_random_dense_sparse(rng, n, n, density=d)
    A = CSR.fromdense(dense)
    packed = pack_sell_rowpure(A, group=g)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(spmv_sell_rowpure(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=0.5)


def test_rowpure_lane_collisions(rng):
    from sparsematrix_tpu.kernels.spmv_pallas import (
        pack_sell_rowpure,
        spmv_sell_rowpure,
    )

    # many same-lane columns in one row → deep collision slabs
    dense = np.zeros((8, 2048), dtype=np.float32)
    dense[3, [0, 128, 256, 384, 1024, 1152]] = rng.uniform(1, 2, 6)  # lane 0
    A = CSR.fromdense(dense)
    packed = pack_sell_rowpure(A, group=2)
    x = rng.uniform(-1, 1, 2048).astype(np.float32)
    y = np.asarray(spmv_sell_rowpure(packed, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-5, atol=1e-3)


def test_rowpure_zero_matrix():
    from sparsematrix_tpu.kernels.spmv_pallas import (
        pack_sell_rowpure,
        spmv_sell_rowpure,
    )

    A = CSR.fromdense(np.zeros((20, 20), dtype=np.float32))
    packed = pack_sell_rowpure(A, group=2)
    y = np.asarray(spmv_sell_rowpure(packed, jnp.ones(20, jnp.float32)))
    np.testing.assert_array_equal(y, np.zeros(20))


def test_spmv_dispatch_accepts_packed(rng):
    from sparsematrix_tpu.kernels.spmv_pallas import (
        pack_sell,
        pack_sell_rowpure,
    )
    from sparsematrix_tpu.ops import spmv

    dense = gen_random_dense_sparse(rng, 64, 96, density=0.1)
    A = CSR.fromdense(dense)
    x = rng.uniform(-1, 1, 96).astype(np.float32)
    for packed in (pack_sell(A, tr=16),
                   pack_sell_rowpure(A, group=2, rows_per_sublane=4)):
        y = np.asarray(spmv(packed, jnp.asarray(x)))
        np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=0.5)
