"""Distributed SpMV/SpMM on a simulated 8-device CPU mesh.

The reference has no distributed layer; this validates the north-star
capability (1-D row partition with RHS all-gather over the mesh; column
partition with psum reduction) against the single-device oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops import spmv, spmm
from sparsematrix_tpu.parallel import (
    dist_spmm,
    dist_spmv,
    make_mesh,
    partition_csr_cols,
    partition_csr_rows,
    shard_partitioned,
)
from sparsematrix_tpu.utils.testutils import (
    gen_matrix_random,
    gen_random_dense_sparse,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


@pytest.mark.parametrize("shape", [(64, 64), (250, 130)])
def test_dist_spmv_rows(rng, mesh, shape):
    dense = gen_random_dense_sparse(rng, *shape, density=0.25)
    csr = CSR.fromdense(dense)
    part = shard_partitioned(partition_csr_rows(csr, 8), mesh)
    x = gen_matrix_random(rng, shape[1], 1)[:, 0]
    y = np.asarray(dist_spmv(part, jnp.asarray(x), mesh))
    oracle = np.asarray(spmv(csr, jnp.asarray(x)))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=0.5)


@pytest.mark.parametrize("shape", [(64, 64), (130, 250)])
def test_dist_spmv_cols(rng, mesh, shape):
    dense = gen_random_dense_sparse(rng, *shape, density=0.25)
    csr = CSR.fromdense(dense)
    part = shard_partitioned(partition_csr_cols(csr, 8), mesh)
    x = gen_matrix_random(rng, shape[1], 1)[:, 0]
    y = np.asarray(dist_spmv(part, jnp.asarray(x), mesh))
    oracle = np.asarray(spmv(csr, jnp.asarray(x)))
    np.testing.assert_allclose(y, oracle, rtol=1e-4, atol=0.5)


@pytest.mark.parametrize("k", [8, 33])
def test_dist_spmm_rows(rng, mesh, k):
    shape = (120, 200)
    dense = gen_random_dense_sparse(rng, *shape, density=0.25)
    csr = CSR.fromdense(dense)
    part = shard_partitioned(partition_csr_rows(csr, 8), mesh)
    X = gen_matrix_random(rng, shape[1], k)
    Y = np.asarray(dist_spmm(part, jnp.asarray(X), mesh))
    oracle = np.asarray(spmm(csr, jnp.asarray(X)))
    np.testing.assert_allclose(Y, oracle, rtol=1e-4, atol=0.5)


def test_dist_spgemm(rng, mesh):
    from sparsematrix_tpu.parallel import (
        dist_spgemm_apply,
        dist_spgemm_plan,
        shard_dist_spgemm,
    )

    a = gen_random_dense_sparse(rng, 40, 64, density=0.15)
    b = gen_random_dense_sparse(rng, 64, 36, density=0.15)
    plan = shard_dist_spgemm(
        dist_spgemm_plan(CSR.fromdense(a), CSR.fromdense(b), 8), mesh
    )
    C = dist_spgemm_apply(plan, mesh)
    oracle = a.astype(np.float64) @ b.astype(np.float64)
    np.testing.assert_allclose(np.asarray(C.todense()), oracle,
                               rtol=1e-4, atol=1.0)


def test_dist_spmv_jit_compiles(rng, mesh):
    """The whole distributed op must be jittable end-to-end."""
    dense = gen_random_dense_sparse(rng, 64, 64, density=0.3)
    csr = CSR.fromdense(dense)
    part = shard_partitioned(partition_csr_rows(csr, 8), mesh)
    x = jnp.asarray(gen_matrix_random(rng, 64, 1)[:, 0])

    f = jax.jit(lambda p, v: dist_spmv(p, v, mesh))
    y1 = np.asarray(f(part, x))
    y2 = np.asarray(f(part, 2 * x))
    np.testing.assert_allclose(y2, 2 * y1, rtol=1e-5, atol=1e-3)


def test_dist_spmm_bell(rng, mesh):
    from sparsematrix_tpu.formats import csr_to_blocked_ell
    from sparsematrix_tpu.parallel import (
        dist_spmm_bell,
        partition_bell_rows,
        shard_bell,
    )

    dense = gen_random_dense_sparse(rng, 128, 256, density=0.05)
    bell = csr_to_blocked_ell(CSR.fromdense(dense), block_shape=(8, 64))
    part = shard_bell(partition_bell_rows(bell, 8), mesh)
    X = gen_matrix_random(rng, 256, 32)
    Y = np.asarray(dist_spmm_bell(part, jnp.asarray(X), mesh))
    oracle = dense.astype(np.float64) @ X
    np.testing.assert_allclose(Y, oracle, rtol=1e-4, atol=0.5)


def test_dist_spmv_halo_banded(rng, mesh):
    from sparsematrix_tpu.parallel import (
        dist_spmv_halo,
        partition_csr_halo,
        shard_halo,
    )

    n = 256
    bw = 9
    dense = np.zeros((n, n), dtype=np.float32)
    for off in range(-bw // 2, bw // 2 + 1):
        i = np.arange(max(0, -off), min(n, n - off))
        dense[i, i + off] = rng.uniform(-1, 1, i.shape[0])
    csr = CSR.fromdense(dense)
    part = shard_halo(partition_csr_halo(csr, 8, halo=8), mesh)
    x = gen_matrix_random(rng, n, 1)[:, 0]
    y = np.asarray(dist_spmv_halo(part, jnp.asarray(x), mesh))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-4, atol=0.5)


def test_halo_partition_rejects_nonlocal(rng):
    from sparsematrix_tpu.parallel import partition_csr_halo

    dense = gen_random_dense_sparse(rng, 64, 64, density=0.3)  # global coupling
    with pytest.raises(ValueError):
        partition_csr_halo(CSR.fromdense(dense), 8, halo=2)


def test_dist_spmm_2d(rng):
    from sparsematrix_tpu.parallel import dist_spmm_2d, make_mesh_2d

    mesh2 = make_mesh_2d(4, 2)
    dense = gen_random_dense_sparse(rng, 96, 120, density=0.2)
    csr = CSR.fromdense(dense)
    part = partition_csr_rows(csr, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    part = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh2, P("row"))), part
    )
    X = gen_matrix_random(rng, 120, 10)
    Y = np.asarray(dist_spmm_2d(part, jnp.asarray(X), mesh2))
    oracle = np.asarray(spmm(csr, jnp.asarray(X)))
    np.testing.assert_allclose(Y, oracle, rtol=1e-4, atol=0.5)


def test_global_mesh_helper():
    from sparsematrix_tpu.parallel.multihost import global_mesh

    m1 = global_mesh()
    assert m1.devices.size == jax.device_count()
    m2 = global_mesh(("row", "col"), shape=(4, 2))
    assert m2.shape == {"row": 4, "col": 2}
