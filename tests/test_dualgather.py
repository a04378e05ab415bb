"""Dual-gather SpMV kernel vs oracle (interpret mode on CPU), packer
invariants (C1/C2 + fill vs the König bound), and VJPs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_dualgather import (
    DualGather,
    pack_dualgather,
    spmv_dualgather,
)
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


def _rand_csr(rng, rows, cols, density):
    dense = gen_random_dense_sparse(rng, rows, cols, density=density)
    return CSR.fromdense(dense), dense


@pytest.mark.parametrize("shape,density", [
    ((64, 256), 0.2),
    ((300, 1500), 0.05),   # odd rows, cols spanning 2 windows
    ((129, 1024), 0.1),    # rows just past one tile
    ((1000, 3000), 0.02),
    ((512, 4096), 0.12),   # deep buckets: rowlane's worst case
])
def test_dualgather_matches_oracle(rng, shape, density):
    A, dense = _rand_csr(rng, *shape, density)
    packed = pack_dualgather(A, group=4)
    x = rng.standard_normal(shape[1]).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    want = dense.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_dualgather_group_sizes(rng):
    A, dense = _rand_csr(rng, 200, 2048, 0.08)
    x = rng.standard_normal(2048).astype(np.float32)
    want = dense.astype(np.float64) @ x
    for group in (1, 2, 8):
        packed = pack_dualgather(A, group=group)
        got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_dualgather_fill_beats_rowlane(rng):
    """The whole point: on uniform random the dual-gather fill should be
    bounded by row-degree mean/max (Poisson), roughly 2x the rowlane
    bucket-bound fill."""
    from sparsematrix_tpu.kernels.spmv_rowlane import pack_sell_rowlane

    A, _ = _rand_csr(rng, 1024, 8192, 0.02)  # ~164 nnz/row, lambda=20/win
    dg = pack_dualgather(A, group=8)
    rl = pack_sell_rowlane(A, group=8)
    assert dg.fill_rate > 1.5 * rl.fill_rate, (dg.fill_rate, rl.fill_rate)
    assert dg.fill_rate > 0.45, dg.fill_rate


def test_dualgather_slot_invariants(rng):
    """C1 (one entry per (slab, u, row)) and C2 (per (slab, u, cl): one
    chunk) hold by construction; decode every slot back and compare the
    reconstructed matrix with the original."""
    A, dense = _rand_csr(rng, 300, 2200, 0.06)
    p = pack_dualgather(A, group=2)
    n_groups, GH, _ = p.idxB.shape
    iB = np.asarray(p.idxB).reshape(n_groups, p.group, 8, 128).astype(int)
    iA = np.asarray(p.idxA).reshape(n_groups, p.group, 8, 128).astype(int)
    vals = np.asarray(p.vals).reshape(n_groups, p.group, 8, 128)
    win = np.asarray(p.slab_win)
    tile = np.asarray(p.group_tile)
    rec = np.zeros_like(dense, dtype=np.float64)
    for g in range(n_groups):
        for b in range(p.group):
            for u in range(8):
                for l in range(128):
                    v = vals[g, b, u, l]
                    if v == 0:
                        continue
                    r = tile[g] * 128 + l
                    cl = iB[g, b, u, l]
                    ch = iA[g, b, u, cl]
                    c = win[g, b] * 1024 + ch * 128 + cl
                    assert rec[r, c] == 0, "duplicate slot for one entry"
                    rec[r, c] = v
    nz = dense != 0
    np.testing.assert_allclose(rec[nz], dense[nz], rtol=1e-6)
    # zeros stored as explicit entries are allowed to be missing from rec
    assert (rec[~nz] == 0).all()


def test_dualgather_vjp_x(rng):
    A, dense = _rand_csr(rng, 200, 1200, 0.05)
    packed = pack_dualgather(A, group=2)
    x = jnp.asarray(rng.standard_normal(1200).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmv_dualgather(packed, xx), x)
    (gx,) = vjp(g)
    want = dense.astype(np.float64).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)


def test_dualgather_vjp_with_transpose_pack(rng):
    A, dense = _rand_csr(rng, 256, 1024, 0.08)
    packed = pack_dualgather(A, group=2, with_transpose=True)
    assert packed.t_pack is not None
    x = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmv_dualgather(packed, xx), x)
    (gx,) = vjp(g)
    want = dense.astype(np.float64).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)


def test_dualgather_vjp_vals(rng):
    """d/dvals: the cotangent lands on exactly the stored slots."""
    A, dense = _rand_csr(rng, 130, 600, 0.05)
    packed = pack_dualgather(A, group=1)
    x = jnp.asarray(rng.standard_normal(600).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(130).astype(np.float32))
    _, vjp = jax.vjp(lambda p: spmv_dualgather(p, x), packed)
    (dp,) = vjp(g)
    # check a few stored slots: dval = x[col] * g[row]
    iB = np.asarray(packed.idxB).astype(int)
    iA = np.asarray(packed.idxA).astype(int)
    vals = np.asarray(packed.vals)
    dv = np.asarray(dp.vals)
    win = np.asarray(packed.slab_win)
    tile = np.asarray(packed.group_tile)
    xn, gn = np.asarray(x), np.asarray(g)
    checked = 0
    n_groups, GH, _ = vals.shape
    for gi in range(n_groups):
        for row_in_plane in range(GH):
            b, u = divmod(row_in_plane, 8)
            for l in range(128):
                if vals[gi, row_in_plane, l] == 0:
                    continue
                r = tile[gi] * 128 + l
                cl = iB[gi, row_in_plane, l]
                ch = iA[gi, b * 8 + u, cl]
                c = win[gi, b] * 1024 + ch * 128 + cl
                if r < 130 and c < 600:
                    np.testing.assert_allclose(
                        dv[gi, row_in_plane, l], xn[c] * gn[r], rtol=1e-4)
                    checked += 1
                if checked > 200:
                    return
    assert checked > 0


def test_dualgather_bf16_storage(rng):
    A, dense = _rand_csr(rng, 256, 2048, 0.05)
    packed = pack_dualgather(A, group=4, dtype=jnp.bfloat16)
    assert packed.vals.dtype == jnp.bfloat16
    x = rng.standard_normal(2048).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    # oracle uses the bf16-truncated matrix (storage precision), fp64 accum
    want = np.asarray(jnp.asarray(dense).astype(jnp.bfloat16)).astype(
        np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_dualgather_empty(rng):
    A = CSR.fromdense(np.zeros((64, 256), np.float32))
    packed = pack_dualgather(A)
    x = rng.standard_normal(256).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    np.testing.assert_allclose(got, 0.0)


@pytest.mark.parametrize("spill_cap", [8, 16, "auto"])
def test_dualgather_spill_cap(rng, spill_cap):
    """Capped body + pooled tail must stay exact and lift fill."""
    A, dense = _rand_csr(rng, 512, 4096, 0.06)  # ~246 nnz/row, deep tails
    packed = pack_dualgather(A, spill_cap=spill_cap)
    x = rng.standard_normal(4096).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    want = dense.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    # fill improves when the cap sits near the mean row-window degree
    # (cap=8 over-spills on purpose here — correctness-only)
    if packed.tail is not None and spill_cap != 8:
        base = pack_dualgather(A)
        assert packed.fill_rate > base.fill_rate, (
            packed.fill_rate, base.fill_rate)


def test_dualgather_spill_vjp(rng):
    A, dense = _rand_csr(rng, 256, 2048, 0.08)
    packed = pack_dualgather(A, spill_cap=8)
    assert packed.tail is not None
    x = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmv_dualgather(packed, xx), x)
    (gx,) = vjp(g)
    want = dense.astype(np.float64).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)
    # vals cotangent flows to the tail too
    _, vjp2 = jax.vjp(lambda p: spmv_dualgather(p, x), packed)
    (dp,) = vjp2(g)
    assert np.abs(np.asarray(dp.tail.vals)).max() > 0


@pytest.mark.parametrize("k_tiles", [2, 4])
def test_dualgather_superblock(rng, k_tiles):
    """k_tiles>1: multi-tile output blocks with accumulator commits."""
    A, dense = _rand_csr(rng, 700, 3000, 0.04)  # 6 tiles, odd edges
    packed = pack_dualgather(A, group=4, k_tiles=k_tiles)
    assert packed.k_tiles == k_tiles and packed.commit is not None
    x = rng.standard_normal(3000).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    want = dense.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_dualgather_superblock_vjp(rng):
    A, dense = _rand_csr(rng, 300, 1500, 0.05)
    packed = pack_dualgather(A, group=2, k_tiles=4)
    x = jnp.asarray(rng.standard_normal(1500).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: spmv_dualgather(packed, xx), x)
    (gx,) = vjp(g)
    want = dense.astype(np.float64).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)


def test_dualgather_superblock_splits(rng):
    """Multi-call chunking must split at superblock boundaries."""
    from sparsematrix_tpu.kernels import spmv_dualgather as dgm
    A, dense = _rand_csr(rng, 2048, 2048, 0.03)
    old = dgm._SMEM_PREFETCH_BUDGET
    dgm._SMEM_PREFETCH_BUDGET = 600  # force tiny per-call budget
    try:
        packed = pack_dualgather(A, group=2, k_tiles=2)
        assert len(packed.splits) > 0
        x = rng.standard_normal(2048).astype(np.float32)
        got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
        want = dense.astype(np.float64) @ x
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    finally:
        dgm._SMEM_PREFETCH_BUDGET = old


def test_spmm_dualgather_vjp(rng):
    from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather
    from sparsematrix_tpu.formats import CSR
    from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse

    n, k = 640, 6
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    packed = pack_dualgather(CSR.fromdense(dense), group=4, k_tiles=1)
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    import dataclasses

    def loss(v, Xv):
        return jnp.vdot(W, spmm_dualgather(
            dataclasses.replace(packed, vals=v), Xv))

    g_vals, gX = jax.grad(loss, argnums=(0, 1))(packed.vals, X)
    # d/dX <W, A X> = A^T W
    np.testing.assert_allclose(np.asarray(gX),
                               dense.T.astype(np.float64) @ np.asarray(W),
                               rtol=2e-3, atol=0.5)
    # value cotangents: rebuild dense gradient via the slab coordinates
    from sparsematrix_tpu.kernels.spmv_dualgather import _slot_row_col
    row, col = _slot_row_col(packed)
    dv = np.asarray(g_vals)
    want_dense = np.asarray(W, np.float64) @ np.asarray(X, np.float64).T
    mask = np.asarray(packed.vals) != 0
    got = dv[mask]
    want = want_dense[np.asarray(row)[mask], np.asarray(col)[mask]]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("shape,density,group,k_tiles", [
    ((512, 4096), 0.08, 4, 2),    # even group → nibble + two_win
    ((300, 3000), 0.05, 3, 2),    # odd group → plain-byte two_win
    ((1024, 8192), 0.02, 8, 4),
])
def test_dualgather_two_win_matches_oracle(rng, shape, density, group,
                                           k_tiles):
    """Two-window slabs (round-4 fill break): oracle match through the
    interpret-mode superblock kernel, both nibble and byte idxA."""
    A, dense = _rand_csr(rng, *shape, density)
    packed = pack_dualgather(A, group=group, k_tiles=k_tiles, two_win=True)
    assert packed.two_win
    x = rng.standard_normal(shape[1]).astype(np.float32)
    got = np.asarray(spmv_dualgather(packed, jnp.asarray(x)))
    want = dense.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_dualgather_two_win_fill_gain(rng):
    """The pairing must beat the single-window structural fill."""
    A, _ = _rand_csr(rng, 1024, 8192, 0.02)
    base = pack_dualgather(A, group=8, k_tiles=4)
    tw = pack_dualgather(A, group=8, k_tiles=4, two_win=True)
    assert tw.fill_rate > base.fill_rate * 1.1, (
        tw.fill_rate, base.fill_rate)


def test_dualgather_two_win_vjp(rng):
    A, dense = _rand_csr(rng, 256, 2048, 0.1)
    packed = pack_dualgather(A, group=4, k_tiles=2, two_win=True)
    x = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(256).astype(np.float32))

    y, vjp = jax.vjp(lambda xx: spmv_dualgather(packed, xx), x)
    (gx,) = vjp(g)
    want = dense.astype(np.float64).T @ np.asarray(g)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)

    def loss_vals(vals):
        import dataclasses as dc

        p2 = dc.replace(packed, vals=vals)
        return jnp.vdot(spmv_dualgather(p2, x), g)

    dv = jax.grad(loss_vals)(packed.vals)
    # finite-check a few slots against x[col]*g[row]
    from sparsematrix_tpu.kernels.spmv_dualgather import _slot_row_col

    row, col = _slot_row_col(packed)
    mask = np.asarray(packed.vals) != 0
    want_dv = np.where(mask,
                       np.asarray(x)[np.asarray(col).reshape(mask.shape)]
                       * np.asarray(g)[np.asarray(row).reshape(mask.shape)],
                       0)
    np.testing.assert_allclose(np.asarray(dv), want_dv, rtol=2e-3, atol=1e-4)


def test_dualgather_two_win_rejects_bad_config(rng):
    A, _ = _rand_csr(rng, 128, 1024, 0.1)
    with pytest.raises(ValueError):
        pack_dualgather(A, two_win=True)  # k_tiles=1
    with pytest.raises(ValueError):
        pack_dualgather(A, k_tiles=2, two_win=True, spill_cap=8)


@pytest.mark.parametrize("pack_kwargs", [
    dict(k_tiles=4, group=8),                  # nibble superblock
    dict(k_tiles=4, group=8, two_win=True),    # two-window superblock
    dict(k_tiles=8, group=16),
])
def test_spmm_dualgather_superblock(rng, pack_kwargs):
    """Multi-RHS walk over superblock packs (nibble + two-window): the
    fori-loop-per-column kernel must match the fp64 oracle for k not a
    multiple of the panel width."""
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

    n, k = 1100, 13  # odd rows; k % panel != 0
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    packed = pack_dualgather(CSR.fromdense(dense), **pack_kwargs)
    X = rng.standard_normal((n, k)).astype(np.float32)
    got = np.asarray(spmm_dualgather(packed, jnp.asarray(X)))
    want = dense.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_spmm_dualgather_superblock_vjp(rng):
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

    n, k = 640, 5
    dense = gen_random_dense_sparse(rng, n, n, density=0.02)
    packed = pack_dualgather(CSR.fromdense(dense), group=4, k_tiles=4)
    X = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    gX = jax.grad(lambda x: spmm_dualgather(packed, x).sum())(X)
    want = dense.astype(np.float64).T @ np.ones((n, k))
    np.testing.assert_allclose(np.asarray(gX), want, rtol=2e-3, atol=0.5)


def test_spmm_dualgather_superblock_splits_and_spill(rng):
    """Chunked multi-call path + pooled tail through the multi-RHS walk."""
    from sparsematrix_tpu.kernels import spmv_dualgather as dgm
    from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather

    A, dense = _rand_csr(rng, 2048, 2048, 0.03)
    old = dgm._SMEM_PREFETCH_BUDGET
    dgm._SMEM_PREFETCH_BUDGET = 600
    try:
        packed = pack_dualgather(A, group=2, k_tiles=2)
        assert len(packed.splits) > 0
        X = rng.standard_normal((2048, 9)).astype(np.float32)
        got = np.asarray(spmm_dualgather(packed, jnp.asarray(X)))
        want = dense.astype(np.float64) @ X
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    finally:
        dgm._SMEM_PREFETCH_BUDGET = old
