"""Hybrid SpMV layout for POWER-LAW structures.

The round-5 skew bench exposed the first-fit packers' i.i.d. assumption
(VERDICT r4 §6): on Zipf-degree matrices the dual-gather fill collapses
0.62 → 0.05 (2 % SoL) because one hub row (or hub column) forces every
(tile, window) it touches to its own depth — 127 near-empty lanes per
slab.  The fix is structural, not a packer tweak:

1. **Hub columns** (col degree ≥ rows/8) move to a dense (rows × hc)
   block: at that degree a dense column costs the same HBM bytes as its
   sparse entries, and removing it un-poisons every window it occupied.
2. **Hub rows** (row degree ≥ cols/8, measured after hub-column
   removal) move to a dense (hr × cols) block, same byte argument.
3. **The rest is sorted by row degree** so each 128-row tile carries
   near-uniform degrees — slab depth ≈ the tile's own degree scale
   instead of its worst row — then packed by the normal auto layout.
   The output permutation ships as a Clos/sort plan (ops/permute.py),
   measured-cheap at every size.

y = P⁻¹(spmv(base, x)) + D_rows @ x + scatter(D_cols @ x[hub_cols]).

No reference analogue (the reference's generator is uniform,
blas_test.h:133-147); built against SURVEY §7's "honest roofline"
mandate for non-uniform structure.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSR
from ..formats.base import register_sparse_pytree

__all__ = ["SkewSpmv", "pack_skew", "spmv_skew", "spmm_skew",
           "skew_stats"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SkewSpmv:
    base: object  # packed layout over the degree-sorted remainder
    out_perm: object  # planned permutation: base slot → original row
    hub_rows: jnp.ndarray  # (hr,) int32 original row ids
    hub_rows_dense: jnp.ndarray  # (hr, cols) fp32
    hub_cols: jnp.ndarray  # (hc,) int32 original col ids
    hub_cols_dense: jnp.ndarray  # (rows, hc) fp32
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:  # bench convenience: the base's fill
        return getattr(self.base, "fill_rate", 1.0)


def skew_stats(A: CSR):
    """(max_row_deg, mean_row_deg, max_col_deg) from host arrays."""
    indptr = np.asarray(A.indptr)
    deg = np.diff(indptr)
    cd = np.bincount(np.asarray(A.indices)[: A.nnz], minlength=A.shape[1])
    mean = max(A.nnz / max(A.shape[0], 1), 1e-9)
    return int(deg.max(initial=0)), float(mean), int(cd.max(initial=0))


def pack_skew(A: CSR, row_hub_frac: float = 0.125,
              col_hub_frac: float = 0.125, **base_kwargs) -> SkewSpmv:
    """Split hub rows/cols to dense blocks, degree-sort and pack the
    rest (see module docstring)."""
    import scipy.sparse as sps

    from .permute import plan_permutation_auto
    from .spmv import prepare_spmv

    sp = A.to_scipy().tocsr()
    sp.sum_duplicates()
    rows, cols = sp.shape
    col_deg = np.bincount(sp.indices, minlength=cols)
    hub_cols = np.flatnonzero(col_deg >= max(int(rows * col_hub_frac), 64))
    if len(hub_cols):
        keep_mask = np.ones(cols, bool)
        keep_mask[hub_cols] = False
        csc = sp.tocsc()
        hub_cols_dense = np.asarray(csc[:, hub_cols].todense(),
                                    dtype=np.float32)
        # drop the hub columns from the sparse remainder
        keep_entry = keep_mask[sp.indices]
        rows_of = np.repeat(np.arange(rows), np.diff(sp.indptr))
        cnt = np.bincount(rows_of[keep_entry], minlength=rows)
        sp = sps.csr_matrix(
            (sp.data[keep_entry], sp.indices[keep_entry],
             np.concatenate([[0], np.cumsum(cnt)])),
            shape=(rows, cols))
    else:
        hub_cols_dense = np.zeros((rows, 0), np.float32)
    deg = np.diff(sp.indptr)
    hub_rows = np.flatnonzero(deg >= max(int(cols * row_hub_frac), 64))
    if len(hub_rows) == rows:
        # degenerate: every row is a hub — keep one row in the sparse
        # base so the output-permutation plan stays well-formed
        hub_rows = hub_rows[:-1]
    if len(hub_rows):
        hub_rows_dense = np.asarray(sp[hub_rows].todense(),
                                    dtype=np.float32)
    else:
        hub_rows_dense = np.zeros((0, cols), np.float32)
    rest = np.setdiff1d(np.arange(rows), hub_rows, assume_unique=True)
    # degree-sort (desc, stable) so tiles carry near-uniform degrees
    order = rest[np.argsort(-deg[rest], kind="stable")]
    A_rest = sp[order].tocsr()
    base = prepare_spmv(CSR.from_scipy(A_rest), skew="off",
                        **base_kwargs)
    # out[r] = y_rest[position of r in order]; hub rows read zero padding
    g = np.full(rows, len(order), np.int64)
    g[order] = np.arange(len(order))
    out_perm = plan_permutation_auto(g, n_src=max(len(order), 1))
    return SkewSpmv(
        base=base,
        out_perm=out_perm,
        hub_rows=jnp.asarray(hub_rows, jnp.int32),
        hub_rows_dense=jnp.asarray(hub_rows_dense),
        hub_cols=jnp.asarray(hub_cols, jnp.int32),
        hub_cols_dense=jnp.asarray(hub_cols_dense),
        shape=(rows, cols), nnz=A.nnz)


def spmv_skew(packed: SkewSpmv, x):
    """``y = A @ x`` over the hybrid layout (jittable, differentiable —
    a composition of differentiable pieces)."""
    from .permute import apply_permutation
    from .spmv import spmv

    rows, cols = packed.shape
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y_rest = spmv(packed.base, x)
    y = apply_permutation(packed.out_perm, y_rest)
    if packed.hub_cols_dense.shape[1]:
        y = y + jnp.dot(packed.hub_cols_dense, x[packed.hub_cols],
                        precision=prec)
    if packed.hub_rows_dense.shape[0]:
        yh = jnp.dot(packed.hub_rows_dense, x, precision=prec)
        y = y.at[packed.hub_rows].add(yh)
    return y


def _base_spmm(base, X):
    """Multi-RHS over the degree-sorted base pack: ops.spmm where the
    pack type has a real SpMM path; otherwise a sequential per-column
    walk of the SpMV kernel (lax.map — correct for any base layout,
    e.g. the rowlane superblock pack, which has no matrix kernel)."""
    from ..formats import StripDense
    from ..kernels.spmv_dualgather import DualGather
    from ..kernels.spmv_octet import Octet
    from .spmm import spmm
    from .spmm_lowdeg import SlicedEllMM

    ok = isinstance(base, (Octet, SlicedEllMM, StripDense))
    if isinstance(base, DualGather):
        ok = base.k_tiles > 1 or (base.tail is None and not base.splits)
    if ok:
        return spmm(base, X)
    from .spmv import spmv

    return jax.lax.map(lambda c: spmv(base, c), X.T).T


def spmm_skew(packed: SkewSpmv, X):
    """``Y = A @ X`` over the hybrid layout: base multi-RHS + row-wise
    planned unpermutation + dense MXU hub blocks (jittable,
    differentiable — a composition of differentiable pieces)."""
    from .permute import apply_permutation

    rows, cols = packed.shape
    if X.ndim != 2 or X.shape[0] != cols:
        raise ValueError(
            f"spmm_skew: X shape {X.shape} incompatible with {packed.shape}")
    prec = (jax.lax.Precision.HIGHEST if X.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y_rest = _base_spmm(packed.base, X)
    y = apply_permutation(packed.out_perm, y_rest)
    if packed.hub_cols_dense.shape[1]:
        y = y + jnp.dot(packed.hub_cols_dense, X[packed.hub_cols],
                        precision=prec)
    if packed.hub_rows_dense.shape[0]:
        yh = jnp.dot(packed.hub_rows_dense, X, precision=prec)
        y = y.at[packed.hub_rows].add(yh)
    return y
