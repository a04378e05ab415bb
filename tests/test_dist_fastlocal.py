"""Fast local kernels under distributed SpMM: pre-dense MXU bands (1-D and
2-D mesh) and the rowlane multi-RHS walk — the round-3 answer to "only
dist_spmv_rowlane inherits single-chip kernel throughput"."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.parallel import (dist_spmm_dense, dist_spmm_dense_2d,
                                       dist_spmm_rowlane, make_mesh_2d,
                                       partition_dense_rows,
                                       partition_rowlane, shard_dense,
                                       shard_partitioned)
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


def _mesh(k):
    return Mesh(np.array(jax.devices()[:k]), ("shard",))


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_spmm_dense_matches(rng, n_shards):
    n, k = 384, 96
    dense = gen_random_dense_sparse(rng, n, n, density=0.08)
    A = CSR.fromdense(dense)
    part = shard_dense(partition_dense_rows(A, n_shards), _mesh(n_shards))
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = dist_spmm_dense(part, jnp.asarray(X), _mesh(n_shards))
    np.testing.assert_allclose(np.asarray(Y),
                               dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


def test_dist_spmm_dense_bf16_band(rng):
    n, k = 256, 64
    dense = gen_random_dense_sparse(rng, n, n, density=0.1)
    A = CSR.fromdense(dense)
    part = shard_dense(partition_dense_rows(A, 4, dtype=jnp.bfloat16),
                       _mesh(4))
    assert part.bands.dtype == jnp.bfloat16
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = dist_spmm_dense(part, jnp.asarray(X), _mesh(4))
    want = (np.asarray(jnp.asarray(dense).astype(jnp.bfloat16))
            .astype(np.float64) @ np.asarray(
                jnp.asarray(X).astype(jnp.bfloat16)).astype(np.float64))
    np.testing.assert_allclose(np.asarray(Y), want, rtol=2e-2, atol=8.0)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 2)])
def test_dist_spmm_dense_2d_matches(rng, mesh_shape):
    n_row, n_col = mesh_shape
    n, k = 320, 72
    dense = gen_random_dense_sparse(rng, n, n, density=0.08)
    A = CSR.fromdense(dense)
    mesh = make_mesh_2d(n_row, n_col)
    part = partition_dense_rows(A, n_row)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = dist_spmm_dense_2d(part, jnp.asarray(X), mesh)
    np.testing.assert_allclose(np.asarray(Y),
                               dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dist_spmm_rowlane_matches(rng, n_shards):
    n, k = 512, 16
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    A = CSR.fromdense(dense)
    part = partition_rowlane(A, n_shards, group=4)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = dist_spmm_rowlane(part, jnp.asarray(X), _mesh(n_shards))
    np.testing.assert_allclose(np.asarray(Y),
                               dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_spmv_dualgather_matches(rng, n_shards):
    from sparsematrix_tpu.parallel import (dist_spmv_dualgather,
                                           partition_dualgather)

    n = 1536
    dense = gen_random_dense_sparse(rng, n, n, density=0.03)
    part = partition_dualgather(CSR.fromdense(dense), n_shards, group=4)
    x = rng.standard_normal(n).astype(np.float32)
    y = dist_spmv_dualgather(part, jnp.asarray(x), _mesh(n_shards))
    np.testing.assert_allclose(np.asarray(y),
                               dense.astype(np.float64) @ x,
                               rtol=2e-3, atol=0.5)


def test_dist_spmv_dualgather_rect_jit(rng):
    from sparsematrix_tpu.parallel import (dist_spmv_dualgather,
                                           partition_dualgather)

    rows, cols = 900, 1400
    dense = gen_random_dense_sparse(rng, rows, cols, density=0.03)
    mesh = _mesh(4)
    part = partition_dualgather(CSR.fromdense(dense), 4, group=2)
    f = jax.jit(lambda p, v: dist_spmv_dualgather(p, v, mesh))
    x = rng.standard_normal(cols).astype(np.float32)
    y = np.asarray(f(part, jnp.asarray(x)))
    np.testing.assert_allclose(y, dense.astype(np.float64) @ x,
                               rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_spgemm_packed_matches(rng, n_shards):
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (dist_spgemm_packed_apply,
                                           dist_spgemm_packed_plan,
                                           shard_dist_spgemm_packed)

    n = 512
    sa = sps.random(n, n, density=0.02, random_state=3, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.02, random_state=4, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-10, 10, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-10, 10, sb.nnz).astype(np.float32)
    mesh = _mesh(n_shards)
    plan = shard_dist_spgemm_packed(
        dist_spgemm_packed_plan(CSR.from_scipy(sa), CSR.from_scipy(sb),
                                n_shards, group=4, k_tiles=8), mesh)
    C = dist_spgemm_packed_apply(plan, mesh)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    got = np.asarray(C.data)[: plan.c_nnz]
    np.testing.assert_allclose(got, want.data, rtol=2e-3, atol=1e-3)


def test_dist_spgemm_packed_new_b_values(rng):
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (dist_spgemm_packed_apply,
                                           dist_spgemm_packed_plan,
                                           shard_dist_spgemm_packed)

    n = 384
    sa = sps.random(n, n, density=0.03, random_state=6, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.03, random_state=7, format="csr",
                    dtype=np.float32)
    mesh = _mesh(4)
    plan = shard_dist_spgemm_packed(
        dist_spgemm_packed_plan(CSR.from_scipy(sa), CSR.from_scipy(sb),
                                4, group=2, k_tiles=4), mesh)
    b2 = rng.uniform(-5, 5, sb.nnz).astype(np.float32)
    f = jax.jit(lambda bd: dist_spgemm_packed_apply(plan, mesh, b_data=bd)
                .data)
    got = np.asarray(f(jnp.asarray(b2)))[: plan.c_nnz]
    sb2 = sb.copy()
    sb2.data = b2
    want = (sa.astype(np.float64) @ sb2.astype(np.float64)).tocsr()
    want.sort_indices()
    np.testing.assert_allclose(got, want.data, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_dist_spmm_dualgather_matches(rng, n_shards):
    from sparsematrix_tpu.parallel import (dist_spmm_dualgather,
                                           partition_dualgather)

    n, k = 1024, 24
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    part = partition_dualgather(CSR.fromdense(dense), n_shards, group=4)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = dist_spmm_dualgather(part, jnp.asarray(X), _mesh(n_shards))
    np.testing.assert_allclose(np.asarray(Y),
                               dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


def test_dist_spmm_dualgather_rect_jit(rng):
    from sparsematrix_tpu.parallel import (dist_spmm_dualgather,
                                           partition_dualgather)

    rows, cols, k = 700, 1100, 16
    dense = gen_random_dense_sparse(rng, rows, cols, density=0.03)
    mesh = _mesh(4)
    part = partition_dualgather(CSR.fromdense(dense), 4, group=2)
    f = jax.jit(lambda p, M: dist_spmm_dualgather(p, M, mesh))
    X = rng.standard_normal((cols, k)).astype(np.float32)
    Y = np.asarray(f(part, jnp.asarray(X)))
    np.testing.assert_allclose(Y, dense.astype(np.float64) @ X,
                               rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 2)])
def test_dist_spgemm_packed_2d_matches(rng, mesh_shape):
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (dist_spgemm_packed_apply_2d,
                                           dist_spgemm_packed_plan_2d,
                                           make_mesh_2d,
                                           shard_dist_spgemm_packed_2d)

    n_row, n_k = mesh_shape
    n = 512
    sa = sps.random(n, n, density=0.02, random_state=13, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.02, random_state=14, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-10, 10, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-10, 10, sb.nnz).astype(np.float32)
    mesh = make_mesh_2d(n_row, n_k, axis_names=("row", "k"))
    plan = shard_dist_spgemm_packed_2d(
        dist_spgemm_packed_plan_2d(CSR.from_scipy(sa), CSR.from_scipy(sb),
                                   n_row, n_k, group=4, k_tiles=8), mesh)
    C = dist_spgemm_packed_apply_2d(plan, mesh)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    got = np.asarray(C.data)[: plan.c_nnz]
    np.testing.assert_allclose(got, want.data, rtol=2e-3, atol=1e-3)


def test_dist_spgemm_packed_2d_rect_new_bvals(rng):
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (dist_spgemm_packed_apply_2d,
                                           dist_spgemm_packed_plan_2d,
                                           make_mesh_2d,
                                           shard_dist_spgemm_packed_2d)

    m, k, n = 300, 700, 450  # rectangular; uneven row bands
    sa = sps.random(m, k, density=0.02, random_state=23, format="csr",
                    dtype=np.float32)
    sb = sps.random(k, n, density=0.02, random_state=24, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-5, 5, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-5, 5, sb.nnz).astype(np.float32)
    mesh = make_mesh_2d(4, 2, axis_names=("row", "k"))
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    plan = shard_dist_spgemm_packed_2d(
        dist_spgemm_packed_plan_2d(A, B, 4, 2, group=4, k_tiles=8), mesh)
    # numeric phase accepts fresh B values (same pattern)
    b2 = rng.uniform(-5, 5, sb.nnz).astype(np.float32)
    f = jax.jit(lambda q, bd: dist_spgemm_packed_apply_2d(
        q, mesh, b_data=bd).data)
    got = np.asarray(f(plan, jnp.asarray(np.concatenate(
        [b2, np.zeros(B.data.shape[0] - sb.nnz, np.float32)]))))
    sb2 = sps.csr_matrix((b2, sb.indices, sb.indptr), shape=sb.shape)
    want = (sa.astype(np.float64) @ sb2.astype(np.float64)).tocsr()
    want.sort_indices()
    np.testing.assert_allclose(got[: plan.c_nnz], want.data, rtol=2e-3,
                               atol=1e-3)


def test_dist_spgemm_packed_csc_output(rng):
    """CSC-native distributed numeric phase: same values as the CSR
    apply, in C^T-CSR structure, no output permutation."""
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (
        dist_spgemm_packed_apply, dist_spgemm_packed_apply_csc,
        dist_spgemm_packed_plan, shard_dist_spgemm_packed,
    )

    n = 512
    sa = sps.random(n, n, density=0.02, random_state=5, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.02, random_state=6, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-10, 10, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-10, 10, sb.nnz).astype(np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    mesh = _mesh(8)
    plan = shard_dist_spgemm_packed(
        dist_spgemm_packed_plan(A, B, n_shards=8, group=4, k_tiles=8),
        mesh)
    Ct = dist_spgemm_packed_apply_csc(plan, mesh)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
    np.testing.assert_allclose(np.asarray(Ct.todense()), want.todense(),
                               rtol=2e-3, atol=0.5)
    # structural agreement with the CSR apply
    C = dist_spgemm_packed_apply(plan, mesh)
    np.testing.assert_allclose(np.asarray(Ct.todense()).T,
                               np.asarray(C.todense()), rtol=1e-6)


def test_dist_spgemm_packed_2d_csc_output(rng):
    """2-D CSC-native apply: per-band kernel output IS the data array of
    a cols-partitioned C^T — no c_nnz permutation, data stays
    row-band sharded."""
    import scipy.sparse as sps

    from sparsematrix_tpu.parallel import (
        dist_spgemm_packed_apply_2d, dist_spgemm_packed_apply_2d_csc,
        dist_spgemm_packed_plan_2d, make_mesh_2d,
        shard_dist_spgemm_packed_2d,
    )

    m, k, n = 300, 700, 450  # rectangular; uneven row bands
    sa = sps.random(m, k, density=0.02, random_state=33, format="csr",
                    dtype=np.float32)
    sb = sps.random(k, n, density=0.02, random_state=34, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-5, 5, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-5, 5, sb.nnz).astype(np.float32)
    mesh = make_mesh_2d(4, 2, axis_names=("row", "k"))
    plan = shard_dist_spgemm_packed_2d(
        dist_spgemm_packed_plan_2d(CSR.from_scipy(sa), CSR.from_scipy(sb),
                                   4, 2, group=4, k_tiles=8), mesh)
    Ct = dist_spgemm_packed_apply_2d_csc(plan, mesh)
    assert Ct.partition_axis == "cols" and Ct.n_shards == 4
    # reassemble C^T from the cols-partitioned shards
    band_m = Ct.local_cols
    blocks = []
    for i in range(Ct.n_shards):
        ip = np.asarray(Ct.indptr[i])
        idx = np.asarray(Ct.indices[i])[: ip[-1]]
        dat = np.asarray(Ct.data[i])[: ip[-1]]
        w = min(band_m, m - i * band_m)
        blocks.append(sps.csr_matrix((dat, idx, ip), shape=(n, w)))
    ct = sps.hstack(blocks).tocsr()
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
    np.testing.assert_allclose(ct.todense(), want.todense(), rtol=2e-3,
                               atol=0.5)
    # values agree with the CSR-output apply
    C = dist_spgemm_packed_apply_2d(plan, mesh)
    np.testing.assert_allclose(np.asarray(ct.T.todense()),
                               np.asarray(C.todense()), rtol=1e-6)


def test_dist_spgemm_packed_layouts(rng):
    """Auto picks the octet stack at ~1 pair/slot; forcing superblock
    still matches; both equal the oracle."""
    import scipy.sparse as sps

    from sparsematrix_tpu.kernels.spmv_octet import Octet
    from sparsematrix_tpu.kernels.spmv_superblock import SellSuperblock
    from sparsematrix_tpu.parallel import (dist_spgemm_packed_apply,
                                           dist_spgemm_packed_plan,
                                           shard_dist_spgemm_packed)

    n = 512
    sa = sps.random(n, n, density=0.02, random_state=13, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.02, random_state=14, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-5, 5, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-5, 5, sb.nnz).astype(np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    mesh = _mesh(4)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    outs = {}
    for layout, cls in (("auto", Octet), ("superblock", SellSuperblock)):
        plan = shard_dist_spgemm_packed(
            dist_spgemm_packed_plan(A, B, n_shards=4, group=4, k_tiles=8,
                                    layout=layout), mesh)
        assert isinstance(plan.p_stack, cls)
        C = dist_spgemm_packed_apply(plan, mesh)
        got = np.asarray(C.data)[: plan.c_nnz]
        np.testing.assert_allclose(got, want.data, rtol=2e-3, atol=1e-3)
        outs[layout] = got
    np.testing.assert_allclose(outs["auto"], outs["superblock"],
                               rtol=1e-5, atol=1e-5)


def test_dist_spgemm_b_keys_sort_path(rng):
    """The shard-local b-permute ships as stacked sort keys (TODO r5 #3);
    legacy plans with b_keys=None keep the gather path."""
    import dataclasses

    import scipy.sparse as sps
    from jax.sharding import Mesh

    from sparsematrix_tpu.parallel.dist_spgemm import (
        dist_spgemm_packed_apply, dist_spgemm_packed_plan,
        shard_dist_spgemm_packed)

    sa = sps.random(300, 300, density=0.01, random_state=1, format="csr",
                    dtype=np.float32)
    sb = sps.random(300, 300, density=0.01, random_state=2, format="csr",
                    dtype=np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    plan = dist_spgemm_packed_plan(A, B, n_shards=4)
    assert plan.b_keys is not None and plan.b_keys.shape[0] == 4
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    for p in (plan, dataclasses.replace(plan, b_keys=None)):
        C = dist_spgemm_packed_apply(shard_dist_spgemm_packed(p, mesh),
                                     mesh)
        np.testing.assert_allclose(np.asarray(C.data)[: plan.c_nnz],
                                   want.data, rtol=2e-3, atol=1e-2)


def test_dist_spgemm_b_clos_path(rng):
    """b_permute='clos': stacked per-shard Clos plans applied inside
    shard_map (1-D and 2-D meshes), oracle-exact."""
    import scipy.sparse as sps

    from sparsematrix_tpu.ops.permute_clos import ClosPermutePlan
    from sparsematrix_tpu.parallel.dist_spgemm import (
        dist_spgemm_packed_apply, dist_spgemm_packed_apply_2d,
        dist_spgemm_packed_plan, dist_spgemm_packed_plan_2d,
        shard_dist_spgemm_packed, shard_dist_spgemm_packed_2d)

    sa = sps.random(600, 600, density=0.02, random_state=1, format="csr",
                    dtype=np.float32)
    sb = sps.random(600, 600, density=0.02, random_state=2, format="csr",
                    dtype=np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    plan = dist_spgemm_packed_plan(A, B, n_shards=4, b_permute="clos")
    assert isinstance(plan.b_keys, ClosPermutePlan)
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    C = dist_spgemm_packed_apply(shard_dist_spgemm_packed(plan, mesh),
                                 mesh)
    np.testing.assert_allclose(np.asarray(C.data)[: plan.c_nnz],
                               want.data, rtol=2e-3, atol=1e-2)
    mesh2 = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("row", "k"))
    plan2 = dist_spgemm_packed_plan_2d(A, B, n_row=2, n_k=2,
                                       b_permute="clos")
    C2 = dist_spgemm_packed_apply_2d(
        shard_dist_spgemm_packed_2d(plan2, mesh2), mesh2)
    np.testing.assert_allclose(np.asarray(C2.data)[: plan2.c_nnz],
                               want.data, rtol=2e-3, atol=1e-2)
