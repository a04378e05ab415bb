"""Octet-slab SpMV kernel (kernels/spmv_octet.py) vs oracle, packer
invariants, and the spgemm octet layout."""
import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_octet import (Octet, pack_octet,
                                                 spmv_octet)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("shape,density", [
    ((3000, 5000), 0.0005),   # multi-window, multi-octet
    ((2048, 2048), 0.002),
    ((1100, 900), 0.001),     # odd shapes
    ((5000, 3000), 0.01),     # deg ~30: depth stress
])
def test_octet_matches_oracle(rng, shape, density):
    n, m = shape
    sp = sps.random(n, m, density=density, random_state=1, format="csr",
                    dtype=np.float32)
    sp.data = rng.uniform(-10, 10, sp.nnz).astype(np.float32)
    A = CSR.from_scipy(sp)
    pk = pack_octet(A, k_octets=4)
    x = rng.uniform(-1, 1, m).astype(np.float32)
    got = np.asarray(spmv_octet(pk, jnp.asarray(x)))
    want = sp.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_octet_pack_invariants(rng):
    """Every stored entry routes to exactly its (row, col); no clobbers
    (the depth/slot assignment must place ALL nnz)."""
    import sparsematrix_tpu.kernels.spmv_octet as OC

    sp = sps.random(2000, 3000, density=0.001, random_state=2,
                    format="csr", dtype=np.float32)
    sp.data = rng.uniform(1, 2, sp.nnz).astype(np.float32)  # no zeros
    pk = pack_octet(CSR.from_scipy(sp), k_octets=2)
    row, col = OC._slot_row_col(pk)
    vals4 = np.asarray(pk.vals).reshape(pk.vals.shape[0], pk.group, 8,
                                        128)
    mask = vals4 != 0
    assert mask.sum() == sp.nnz  # nothing dropped
    rec = sps.coo_matrix(
        (vals4[mask], (np.asarray(row)[mask], np.asarray(col)[mask])),
        shape=(max(int(np.asarray(row)[mask].max()) + 1, 2000),
               max(int(np.asarray(col)[mask].max()) + 1, 3000))).tocsr()
    np.testing.assert_allclose(rec[:2000, :3000].toarray(), sp.toarray(),
                               rtol=1e-6)


def test_octet_vjp(rng):
    sp = sps.random(1024, 1024, density=0.01, random_state=2,
                    format="csr", dtype=np.float32)
    sp.data = rng.uniform(-2, 2, sp.nnz).astype(np.float32)
    pk = pack_octet(CSR.from_scipy(sp), k_octets=1)
    x = jnp.asarray(rng.uniform(-1, 1, 1024).astype(np.float32))
    gX = jax.grad(lambda xx: spmv_octet(pk, xx).sum())(x)
    want = sp.T.astype(np.float64) @ np.ones(1024)
    np.testing.assert_allclose(np.asarray(gX), want, rtol=2e-3, atol=0.5)
    # vals cotangent finite + zero on padding
    import dataclasses

    gv = jax.grad(lambda v: spmv_octet(
        dataclasses.replace(pk, vals=v), x).sum())(pk.vals)
    gv = np.asarray(gv)
    assert np.isfinite(gv).all()
    assert (gv[np.asarray(pk.vals) == 0] == 0).all()


def test_octet_superblock_over_budget_raises(rng, monkeypatch):
    """A single superblock whose groups exceed the SMEM prefetch budget
    must raise (a mid-superblock split would strand the accumulator
    partial in a call whose commit flag lives in the next call)."""
    import sparsematrix_tpu.kernels.spmv_dualgather as DG

    monkeypatch.setattr(DG, "_SMEM_PREFETCH_BUDGET", 800)
    # all rows in octet 0, entries spread over ~128 windows → ~128 slabs
    # in ONE superblock (k_octets=1) → groups ≫ the patched budget
    rows = rng.integers(0, 1024, size=100_000)
    cols = rng.integers(0, 131072, size=rows.size)
    vals = rng.uniform(1, 2, rows.size).astype(np.float32)
    sp = sps.coo_matrix((vals, (rows, cols)),
                        shape=(1024, 131072)).tocsr()
    sp.sum_duplicates()
    with pytest.raises(ValueError, match="SMEM prefetch budget"):
        pack_octet(CSR.from_scipy(sp), k_octets=1)


def test_spgemm_csc_densify_raises(rng):
    """output="csc" implies the packed path; method="densify" must not be
    silently ignored (ADVICE r4)."""
    from sparsematrix_tpu.ops.spgemm import spgemm

    sa = sps.random(256, 256, density=0.01, random_state=5, format="csr",
                    dtype=np.float32)
    A = CSR.from_scipy(sa)
    with pytest.raises(ValueError, match="csc"):
        spgemm(A, A, method="densify", output="csc")


def test_octet_empty():
    A = CSR.fromdense(jnp.zeros((64, 64), jnp.float32))
    pk = pack_octet(A)
    y = np.asarray(spmv_octet(pk, jnp.ones(64, jnp.float32)))
    assert (y == 0).all()


def test_spgemm_octet_layout_matches(rng):
    """spgemm packed on the octet layout == superblock layout == oracle
    (csr AND csc outputs)."""
    from sparsematrix_tpu.ops.spgemm import (spgemm_apply_packed,
                                             spgemm_apply_packed_csc,
                                             spgemm_plan_packed)

    n = 600
    sa = sps.random(n, n, density=0.004, random_state=3, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.004, random_state=4, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-10, 10, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-10, 10, sb.nnz).astype(np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    pp_o = spgemm_plan_packed(A, B, layout="octet", group=4, k_octets=2)
    pp_s = spgemm_plan_packed(A, B, layout="superblock")
    assert isinstance(pp_o.p_packed, Octet)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    got_o = np.asarray(spgemm_apply_packed(pp_o, B.data).data)
    got_s = np.asarray(spgemm_apply_packed(pp_s, B.data).data)
    np.testing.assert_allclose(got_o[: pp_o.c_nnz], want.data, rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_allclose(got_o[: pp_o.c_nnz], got_s[: pp_s.c_nnz],
                               rtol=1e-5, atol=1e-5)
    wantT = want.T.tocsr()
    wantT.sort_indices()
    got_c = np.asarray(spgemm_apply_packed_csc(pp_o, B.data).data)
    np.testing.assert_allclose(got_c[: pp_o.c_nnz], wantT.data, rtol=2e-3,
                               atol=1e-3)


def test_spgemm_auto_picks_octet_for_low_pair_density(rng):
    from sparsematrix_tpu.ops.spgemm import spgemm_plan_packed

    n = 800
    sa = sps.random(n, n, density=0.002, random_state=5, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.002, random_state=6, format="csr",
                    dtype=np.float32)
    pp = spgemm_plan_packed(CSR.from_scipy(sa), CSR.from_scipy(sb))
    assert isinstance(pp.p_packed, Octet)  # pairs/slot ~1 → octet


def test_prepare_spmv_auto_octet(rng):
    """prepare_spmv auto routes ≲2-entry/row matrices to the octet pack;
    spmv dispatches it."""
    from sparsematrix_tpu.ops.spmv import prepare_spmv, spmv

    sp = sps.random(4096, 4096, density=0.0004, random_state=1,
                    format="csr", dtype=np.float32)
    sp.data = rng.uniform(-5, 5, sp.nnz).astype(np.float32)
    A = CSR.from_scipy(sp)
    pk = prepare_spmv(A)
    assert isinstance(pk, Octet)
    x = rng.uniform(-1, 1, 4096).astype(np.float32)
    got = np.asarray(spmv(pk, jnp.asarray(x)))
    want = sp.astype(np.float64) @ x
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


@pytest.mark.parametrize("k", [5, 8, 13])
def test_spmm_octet(rng, k):
    """Multi-RHS walk over an octet pack, via kernels API and via the
    ops.spmm pack dispatch."""
    from sparsematrix_tpu.kernels.spmv_octet import spmm_octet
    from sparsematrix_tpu.ops.spmm import spmm

    n, m = 2048, 2048
    sp = sps.random(n, m, density=0.002, random_state=1, format="csr",
                    dtype=np.float32)
    sp.data = rng.uniform(-10, 10, sp.nnz).astype(np.float32)
    pk = pack_octet(CSR.from_scipy(sp), k_octets=2)
    X = rng.uniform(-1, 1, (m, k)).astype(np.float32)
    want = sp.astype(np.float64) @ X
    got = np.asarray(spmm_octet(pk, jnp.asarray(X)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)
    got2 = np.asarray(spmm(pk, jnp.asarray(X)))
    np.testing.assert_allclose(got2, want, rtol=2e-3, atol=0.5)


def test_spmm_octet_vjp(rng):
    """spmm_octet is differentiable in X and vals (VERDICT r4 §5)."""
    from sparsematrix_tpu.kernels.spmv_octet import spmm_octet

    n, m, k = 1500, 1200, 6
    sp = sps.random(n, m, density=0.002, random_state=9, format="csr",
                    dtype=np.float32)
    sp.data = rng.uniform(-2, 2, sp.nnz).astype(np.float32)
    pk = pack_octet(CSR.from_scipy(sp), k_octets=2)
    X = jnp.asarray(rng.uniform(-1, 1, (m, k)).astype(np.float32))
    W = jnp.asarray(rng.uniform(-1, 1, (n, k)).astype(np.float32))
    gX = jax.grad(lambda xx: (spmm_octet(pk, xx) * W).sum())(X)
    want_gX = sp.T.astype(np.float64) @ np.asarray(W)
    np.testing.assert_allclose(np.asarray(gX), want_gX, rtol=2e-3,
                               atol=0.5)
    import dataclasses

    gv = jax.grad(lambda v: (spmm_octet(
        dataclasses.replace(pk, vals=v), X) * W).sum())(pk.vals)
    gv = np.asarray(gv)
    assert np.isfinite(gv).all()
    assert (gv[np.asarray(pk.vals) == 0] == 0).all()
    # nonzero cells carry X^T-weighted cotangents
    assert np.abs(gv).max() > 0


# ---------------------------------------------------------------------------
# round-5 late: trim_group — remainder slabs of each superblock run move
# to a finer-grained second section (Octet.rem), its commits summed with
# the main section's (the per-run group padding was ~13 % of streamed
# plane bytes at the XL pair point)


@pytest.mark.parametrize("shape,density,trim", [
    ((16384, 16384), 2 / 16384, 8),
    ((3000, 5000), 0.0005, 8),
    ((5000, 3000), 0.01, 16),
])
def test_octet_trim_matches_plain(rng, shape, density, trim):
    from sparsematrix_tpu.kernels.spmv_octet import spmm_octet

    n, m = shape
    sp = sps.random(n, m, density=density, random_state=2, format="csr",
                    dtype=np.float32)
    sp.data = rng.uniform(-10, 10, sp.nnz).astype(np.float32)
    A = CSR.from_scipy(sp)
    pk0 = pack_octet(A, group=32, k_octets=4)
    pk1 = pack_octet(A, group=32, k_octets=4, trim_group=trim)
    x = rng.uniform(-1, 1, m).astype(np.float32)
    y0 = np.asarray(spmv_octet(pk0, jnp.asarray(x)))
    y1 = np.asarray(spmv_octet(pk1, jnp.asarray(x)))
    want = sp.astype(np.float64) @ x
    np.testing.assert_allclose(y0, want, rtol=2e-3, atol=0.5)
    np.testing.assert_allclose(y1, want, rtol=2e-3, atol=0.5)
    # same entries stored overall; the trim never stores MORE slab bytes
    sz0 = pk0.vals.size
    sz1 = pk1.vals.size + (pk1.rem.vals.size if pk1.rem is not None
                           else 0)
    assert sz1 <= sz0
    X = rng.uniform(-1, 1, (m, 4)).astype(np.float32)
    Y1 = np.asarray(spmm_octet(pk1, jnp.asarray(X)))
    np.testing.assert_allclose(Y1, sp.astype(np.float64) @ X, rtol=2e-3,
                               atol=0.5)


def test_octet_trim_vjp(rng):
    from sparsematrix_tpu.kernels.spmv_octet import spmm_octet

    n = 8192
    rows_ = np.repeat(np.arange(n), 2)
    cols_ = rng.integers(0, n, rows_.size)
    data_ = rng.uniform(-2, 2, rows_.size).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    pk = pack_octet(CSR.from_scipy(sp), group=32, k_octets=4,
                    trim_group=8)
    assert pk.rem is not None
    x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    w = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    gx = jax.grad(lambda xx: (spmv_octet(pk, xx) * w).sum())(x)
    want = sp.T.astype(np.float64) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(gx), want, rtol=2e-3, atol=0.5)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    W = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    gX = jax.grad(lambda xx: (spmm_octet(pk, xx) * W).sum())(X)
    wantG = sp.T.astype(np.float64) @ np.asarray(W)
    np.testing.assert_allclose(np.asarray(gX), wantG, rtol=2e-3, atol=0.5)


def test_spgemm_octet_trim_matches(rng):
    """The packed SpGEMM path accepts trim_group and stays oracle-exact."""
    from sparsematrix_tpu.ops.spgemm import (spgemm_apply_packed_csc,
                                             spgemm_plan_packed)

    n = 2048
    sa = sps.random(n, n, density=0.004, random_state=3, format="csr",
                    dtype=np.float32)
    sb = sps.random(n, n, density=0.004, random_state=4, format="csr",
                    dtype=np.float32)
    sa.data = rng.uniform(-10, 10, sa.nnz).astype(np.float32)
    sb.data = rng.uniform(-10, 10, sb.nnz).astype(np.float32)
    A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
    pp = spgemm_plan_packed(A, B, layout="octet", group=32, k_octets=16,
                            trim_group=8)
    got = np.asarray(spgemm_apply_packed_csc(pp, B.data).data)
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
    want.sort_indices()
    np.testing.assert_allclose(got[: pp.c_nnz], want.data, rtol=2e-3,
                               atol=1e-3)
