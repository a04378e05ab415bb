"""Row-lane SELL SpMV kernel vs oracle (interpret mode on CPU), VJPs, and
the auto-pack dispatch contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_rowlane import (
    SellRowLane,
    pack_sell_rowlane,
    spmv_sell_rowlane,
)
from sparsematrix_tpu.ops import spmv
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


def _rand_csr(rng, rows, cols, density):
    dense = gen_random_dense_sparse(rng, rows, cols, density=density)
    return CSR.fromdense(dense), dense


@pytest.mark.parametrize("shape,density", [
    ((64, 256), 0.2),
    ((300, 1500), 0.05),   # odd rows, cols spanning 2 windows
    ((129, 1024), 0.1),    # rows just past one tile
    ((1000, 3000), 0.02),
])
@pytest.mark.parametrize("L", [1, 2, 4])
def test_rowlane_matches_oracle(rng, shape, density, L):
    A, dense = _rand_csr(rng, *shape, density)
    packed = pack_sell_rowlane(A, group=4, lanes_per_row=L)
    x = rng.standard_normal(shape[1]).astype(np.float32)
    got = np.asarray(spmv_sell_rowlane(packed, jnp.asarray(x)))
    want = dense.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_rowlane_group_sizes(rng):
    A, dense = _rand_csr(rng, 200, 2048, 0.08)
    x = rng.standard_normal(2048).astype(np.float32)
    want = dense.astype(np.float64) @ x
    for group in (1, 2, 8):
        packed = pack_sell_rowlane(A, group=group)
        got = np.asarray(spmv_sell_rowlane(packed, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_rowlane_empty_and_diag(rng):
    empty = CSR.fromdense(np.zeros((40, 50), np.float32))
    p = pack_sell_rowlane(empty)
    out = np.asarray(spmv_sell_rowlane(p, jnp.ones(50, jnp.float32)))
    np.testing.assert_array_equal(out, 0.0)

    d = np.zeros((100, 100), np.float32)
    np.fill_diagonal(d, np.arange(1, 101, dtype=np.float32))
    p = pack_sell_rowlane(CSR.fromdense(d), lanes_per_row=2)
    x = rng.standard_normal(100).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmv_sell_rowlane(p, jnp.asarray(x))),
                               d @ x, rtol=1e-5, atol=1e-4)


def test_rowlane_spill(rng):
    # one pathologically heavy row chunk: spill caps the slab depth
    dense = gen_random_dense_sparse(rng, 64, 512, density=0.05)
    dense[3, :128] = 7.0  # 128 entries of row 3 in one chunk → bucket 128 deep
    A = CSR.fromdense(dense)
    packed = pack_sell_rowlane(A, spill_depth=4)
    assert packed.spill is not None and packed.spill.nnz > 0
    deep = pack_sell_rowlane(A)
    # fewer stored slab slots in the main body (groups may coincide now
    # that auto-group reaches 256)
    assert packed.vals.size < deep.vals.size
    assert packed.fill_rate > deep.fill_rate
    x = rng.standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmv_sell_rowlane(packed, jnp.asarray(x))),
                               dense.astype(np.float64) @ x, rtol=2e-3, atol=0.5)


def test_rowlane_fill_comparable_to_rowpure(rng):
    # same slab-fill regime as the round-1 row-pure layout (the win is the
    # 1-pass reduction, not the fill); spill_depth is the fill lever
    from sparsematrix_tpu.kernels.spmv_pallas import pack_sell_rowpure

    dense = gen_random_dense_sparse(rng, 512, 4096, density=64 / 4096)
    A = CSR.fromdense(dense)
    rl = pack_sell_rowlane(A)
    rp = pack_sell_rowpure(A, rows_per_sublane=16)
    assert rl.fill_rate >= 0.8 * rp.fill_rate
    capped = pack_sell_rowlane(A, spill_depth=4)
    assert capped.fill_rate > 1.5 * rl.fill_rate  # 0.25 → ~0.48 measured


def test_rowlane_vjp_x(rng):
    A, dense = _rand_csr(rng, 96, 1024, 0.1)
    x = jnp.asarray(rng.standard_normal(1024).astype(np.float32))

    for with_t in (False, True):
        packed = pack_sell_rowlane(A, with_transpose=with_t)
        y, vjp = jax.vjp(lambda v: spmv_sell_rowlane(packed, v), x)
        g = jnp.asarray(rng.standard_normal(96).astype(np.float32))
        (gx,) = vjp(g)
        want = dense.T.astype(np.float64) @ np.asarray(g)
        np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)


def test_rowlane_vjp_vals(rng):
    A, dense = _rand_csr(rng, 48, 640, 0.15)
    packed = pack_sell_rowlane(A)
    x = jnp.asarray(rng.standard_normal(640).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    _, vjp = jax.vjp(lambda p: spmv_sell_rowlane(p, x), packed)
    (dp,) = vjp(g)
    # d/dvals (g . Ax) at slot (r, c) = g[r] * x[c]; check total against the
    # dense bilinear form gradient summed over stored entries
    got = float(jnp.sum(dp.vals * packed.vals))
    want = float(np.sum((np.outer(np.asarray(g), np.asarray(x)) * dense)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1.0)


def test_rowlane_grad_through_jit(rng):
    A, dense = _rand_csr(rng, 64, 512, 0.1)
    packed = pack_sell_rowlane(A, with_transpose=True)
    x = jnp.asarray(rng.standard_normal(512).astype(np.float32))

    @jax.jit
    def loss(p, v):
        return jnp.sum(spmv_sell_rowlane(p, v) ** 2)

    gx = jax.grad(loss, argnums=1)(packed, x)
    want = 2.0 * dense.T.astype(np.float64) @ (dense.astype(np.float64) @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=1.0)


def test_spmv_accepts_rowlane_and_autopacks(rng, monkeypatch):
    import importlib

    from sparsematrix_tpu.config import config as cfg
    spmv_mod = importlib.import_module("sparsematrix_tpu.ops.spmv")

    A, dense = _rand_csr(rng, 256, 2048, 0.05)  # nnz ≈ 26k > thresholds
    x = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    want = dense.astype(np.float64) @ np.asarray(x)

    packed = pack_sell_rowlane(A)
    np.testing.assert_allclose(np.asarray(spmv(packed, x)), want,
                               rtol=2e-3, atol=0.5)

    # force the pallas dispatch path on CPU (interpret mode)
    monkeypatch.setattr(cfg, "kernel_impl", "pallas")
    spmv_mod._AUTO_PACK_CACHE.clear()
    got = np.asarray(spmv(A, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    assert len(spmv_mod._AUTO_PACK_CACHE) == 1  # packed and cached
    got2 = np.asarray(spmv(A, x))  # second call hits the cache
    np.testing.assert_allclose(got2, got, atol=0)
    assert len(spmv_mod._AUTO_PACK_CACHE) == 1


def test_autopack_skips_tracers(rng, monkeypatch):
    from sparsematrix_tpu.config import config as cfg

    monkeypatch.setattr(cfg, "kernel_impl", "pallas")
    A, dense = _rand_csr(rng, 256, 2048, 0.05)
    x = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    got = np.asarray(jax.jit(spmv)(A, x))  # traced CSR → jnp path, no crash
    np.testing.assert_allclose(got, dense.astype(np.float64) @ np.asarray(x),
                               rtol=2e-3, atol=0.5)


def test_native_pack_matches_numpy():
    """Native C++ packer must be bit-identical to the numpy packer."""
    import sparsematrix_tpu.kernels.spmv_rowlane as rl
    from sparsematrix_tpu import native as native_mod

    if native_mod.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for rows, cols, nnz, L, group in [
        (300, 500, 4000, 1, None),
        (1000, 1000, 30000, 2, 16),
        (128, 4096, 20000, 4, None),
        (5000, 300, 60000, 8, None),
    ]:
        r = rng.integers(0, rows, nnz)
        c = rng.integers(0, cols, nnz)
        key = r * cols + c
        _, ui = np.unique(key, return_index=True)
        r, c = r[ui], c[ui]
        v = rng.standard_normal(len(r)).astype(np.float32)
        a = rl._pack_arrays(r, c, v, rows, cols, group, L, v.dtype)
        b = rl._pack_arrays_native(r, c, v, rows, cols, group, L)
        assert b is not None
        for k in ("s_idx", "vals", "group_tile", "slab_win",
                  "tile_nonempty"):
            assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
        for k in ("n_tiles", "n_win", "group"):
            assert a[k] == b[k], k


def test_native_spill_mask_matches_numpy():
    """Native spill mask must equal the numpy occurrence-index mask."""
    import sparsematrix_tpu.kernels.spmv_rowlane as rl
    from sparsematrix_tpu import native as native_mod

    if native_mod.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    W, LANES = rl._W, rl._LANES
    for rows, cols, nnz, L, depth in [
        (300, 500, 6000, 1, 2),
        (1000, 2100, 40000, 2, 3),
        (64, 4096, 20000, 4, 1),
    ]:
        r = rng.integers(0, rows, nnz).astype(np.int64)
        c = rng.integers(0, cols, nnz).astype(np.int64)
        got = rl._spill_mask_native(r, c, rows, cols, L, depth)
        assert got is not None
        T = LANES // L
        key = ((((r // T) * max(-(-cols // W), 1) + c // W) * 8
                + (c % W) // LANES) * T + r % T)
        order = np.argsort(key, kind="stable")
        ko = key[order]
        new = np.empty(len(ko), bool)
        new[0] = True
        new[1:] = ko[1:] != ko[:-1]
        run_start = np.maximum.accumulate(np.where(new, np.arange(len(ko)), 0))
        d = np.arange(len(ko)) - run_start
        want = np.zeros(len(r), bool)
        want[order] = d < L * depth
        assert np.array_equal(got, want)
