"""Pallas BSR SpMM kernel — grouped-matmul pattern.

Grid over *stored blocks* (static block capacity); scalar-prefetched
``block_row_ids``/``indices`` steer the output tile and the RHS slice for
each step.  Consecutive grid steps that hit the same output block-row keep
the accumulator tile resident in VMEM (Pallas's revisiting guarantee), so
each output tile is written to HBM exactly once per block-row.

This replaces the reference's scalar AXPY accumulation with one
(bm × bn) @ (bn × k) MXU matmul per stored block.  Padding block slots carry
zero values and are clamped to the last block-row → they accumulate 0
(sentinel-zero padding, /root/reference/src/sparse/sparse-matrix.cc:29-31).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats import BSR
from .spmm_pallas import _matmul_precision

__all__ = ["spmm_bsr", "PALLAS_IMPLS"]


def _bsr_kernel(brow_ref, bcol_ref, blocks_ref, x_ref, o_ref, *, bn: int,
                precision):
    s = pl.program_id(0)

    @pl.when(jnp.logical_or(s == 0, brow_ref[s] != brow_ref[s - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xt = x_ref[pl.ds(bcol_ref[s] * bn, bn), :]
    o_ref[:] += jnp.dot(
        blocks_ref[0], xt, preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nbr", "interpret"))
def _spmm_bsr_call(brow, bcol, blocks, Xp, *, nbr: int, interpret=False):
    cap, bm, bn = blocks.shape
    k = Xp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # brow, bcol
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda s, brow, bcol: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full X
        ],
        out_specs=pl.BlockSpec(
            (bm, k), lambda s, brow, bcol: (brow[s], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_bsr_kernel, bn=bn,
                          precision=_matmul_precision(Xp.dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, k), Xp.dtype),
        interpret=interpret,
    )(brow, bcol, blocks, Xp)


# ---------------------------------------------------------------------------
# Panel path: one grid step per block-row, ONE MXU dot per step.
#
# The grouped-matmul kernel above issues a tiny (bm, bn) @ (bn, k) dot per
# STORED block — at (8, 8) blocks that is a 3 000+-step grid of 8×8
# contractions using 8 of the MXU's 128 rows.  The panel layout instead
# stores each block-row's blocks horizontally as a (bm, M*bn) panel
# (encode-once, host) and the kernel assembles the matching (M*bn, k) RHS
# from M sublane-aligned x slices, closing the row with a single wide dot.
# Padding slots: zero panel columns + block-col 0 (sentinel-zero stance,
# /root/reference/src/sparse/sparse-matrix.cc:29-31).
# ---------------------------------------------------------------------------

import dataclasses as _dc
from typing import Tuple as _Tuple

from ..formats.base import register_sparse_pytree as _register


@_register
@_dc.dataclass(frozen=True)
class BSRPanels:
    panels: jnp.ndarray  # (nbr, bm, M*bn)
    bcols: jnp.ndarray  # (nbr, M) int32 — padding slots point at tile 0
    shape: _Tuple[int, int] = _dc.field(metadata={"static": True})
    block_shape: _Tuple[int, int] = _dc.field(metadata={"static": True})
    nnz: int = _dc.field(metadata={"static": True})


def pack_bsr_panels(A: BSR) -> BSRPanels:
    """Host-side encode of the panel layout (one-time, cached by spmm)."""
    import numpy as np

    bm, bn = A.block_shape
    nbr = A.num_block_rows
    indptr = np.asarray(A.indptr)
    indices = np.asarray(A.indices)
    data = np.asarray(A.data)
    counts = np.diff(indptr)
    # ignore padding slots beyond the real block count
    n_real = int(indptr[-1])
    M = max(int(counts.max()) if nbr else 1, 1)
    brow = np.repeat(np.arange(nbr), counts)
    slot = np.arange(n_real) - indptr[brow]
    p4 = np.zeros((nbr, M, bm, bn), data.dtype)
    p4[brow, slot] = data[:n_real]
    bcols = np.zeros((nbr, M), np.int32)
    bcols[brow, slot] = indices[:n_real]
    return BSRPanels(
        panels=jnp.asarray(p4.transpose(0, 2, 1, 3).reshape(nbr, bm, M * bn)),
        bcols=jnp.asarray(bcols),
        shape=A.shape,
        block_shape=(bm, bn),
        nnz=A.nnz,
    )


def _bsr_panel_kernel(bcol_ref, panels_ref, x_ref, o_ref, *, bn: int, M: int,
                      precision):
    i = pl.program_id(0)
    xs = [
        x_ref[pl.ds(pl.multiple_of(bcol_ref[i, m] * bn, bn), bn), :]
        for m in range(M)
    ]
    xt = jnp.concatenate(xs, axis=0) if M > 1 else xs[0]  # (M*bn, k)
    o_ref[:] = jnp.dot(
        panels_ref[0], xt, preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_bsr_panel_call(bcols, panels, Xp, *, interpret=False):
    nbr, bm, mbn = panels.shape
    M = bcols.shape[1]
    bn = mbn // M
    k = Xp.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bcols
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec((1, bm, mbn), lambda i, bc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full X
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, bc: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bsr_panel_kernel, bn=bn, M=M,
                          precision=_matmul_precision(Xp.dtype)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, k), Xp.dtype),
        interpret=interpret,
    )(bcols, panels, Xp)


import weakref as _weakref

_PANEL_CACHE: dict = {}


def _panels_for(A: BSR):
    """Pack-and-cache (weakref-evicted) for concrete BSR containers.

    Keyed on the DATA LEAF, not the container: pytree round-trips (e.g.
    the custom_vjp boundary) reconstruct the dataclass per call but reuse
    the same underlying arrays, so the leaf id is the stable identity."""
    import jax.core

    if isinstance(A.data, jax.core.Tracer):
        return None
    key = id(A.data)
    entry = _PANEL_CACHE.get(key)
    if entry is not None and entry[0]() is A.data:
        return entry[1]
    with jax.ensure_compile_time_eval():
        packed = pack_bsr_panels(A)
    ref = _weakref.ref(A.data, lambda _u, k=key: _PANEL_CACHE.pop(k, None))
    _PANEL_CACHE[key] = (ref, packed)
    return packed


def _spmm_bsr_forward(A: BSR, X):
    bm, bn = A.block_shape
    nbr = A.num_block_rows
    nbc = -(-A.shape[1] // bn)
    k = X.shape[1]
    Xp = jnp.zeros((nbc * bn, k), X.dtype).at[: A.shape[1]].set(X)
    # panel path: small blocks only (MXU-sized blocks keep the measured
    # grouped kernel, matching the ops.spmm dispatch), sublane-aligned RHS
    # slices (bn multiple of 8), bounded unrolled slice count
    packed = None
    if bn % 8 == 0 and bm * bn < 4096:
        packed = _panels_for(A)
        if packed is not None and packed.bcols.shape[1] > 64:
            packed = None
    if packed is not None:
        out = _spmm_bsr_panel_call(packed.bcols, packed.panels, Xp,
                                   interpret=config.interpret())
        return out[: A.shape[0]]
    brow = (
        A.block_row_ids
        if A.block_row_ids is not None
        else A._block_row_ids_or_compute()
    )
    # clamp padding rows (== nbr) onto the last real row; their blocks are 0
    brow = jnp.minimum(brow, nbr - 1)
    out = _spmm_bsr_call(brow, A.indices, A.data, Xp, nbr=nbr,
                         interpret=config.interpret())
    # block-rows with no stored blocks are never visited by the grid, so
    # their output tiles are uninitialized — mask them to zero.
    empty = (A.indptr[1:] - A.indptr[:-1]) == 0  # (nbr,)
    out = jnp.where(jnp.repeat(empty, bm)[:, None], 0, out)
    return out[: A.shape[0]]


@jax.custom_vjp
def spmm_bsr(A: BSR, X):
    """``Y = A @ X`` on the MXU via block-CSR structure.

    Differentiable in the stored blocks and ``X`` (block-granular einsum
    backward; forward stays on the Pallas kernel)."""
    return _spmm_bsr_forward(A, X)


def _bsr_fwd(A, X):
    return _spmm_bsr_forward(A, X), (A, X)


def _bsr_bwd(res, g):
    import dataclasses

    import numpy as np

    A, X = res
    bm, bn = A.block_shape
    nbr = A.num_block_rows
    nbc = -(-A.shape[1] // bn)
    k = X.shape[1]
    prec = _matmul_precision(X.dtype)
    gp = jnp.zeros((nbr * bm, k), g.dtype).at[: g.shape[0]].set(g)
    brow = (
        A.block_row_ids
        if A.block_row_ids is not None
        else A._block_row_ids_or_compute()
    )
    # padding slots clamp to the last block-row; their zero blocks kill
    # both gradient terms
    brow_c = jnp.minimum(brow, nbr - 1)
    g_blk = gp.reshape(nbr, bm, k)[brow_c]  # (cap, bm, k)
    dXp = (
        jnp.zeros((nbc, bn, k), X.dtype)
        .at[A.indices]
        .add(jnp.einsum("cij,cik->cjk", A.data, g_blk, precision=prec))
    )
    dX = dXp.reshape(nbc * bn, k)[: A.shape[1]]
    Xp = jnp.zeros((nbc * bn, k), X.dtype).at[: A.shape[1]].set(X)
    Xt = Xp.reshape(nbc, bn, k)[A.indices]  # (cap, bn, k)
    dblocks = jnp.einsum("cik,cjk->cij", g_blk, Xt, precision=prec)
    # zero the padding slots' gradients (their primal blocks are zero but
    # the bilinear form itself is not)
    pad = brow >= nbr
    dblocks = jnp.where(pad[:, None, None], 0, dblocks)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dA = jax.tree_util.tree_map(ct_zero, A)
    dA = dataclasses.replace(dA, data=dblocks.astype(A.data.dtype))
    return dA, dX


spmm_bsr.defvjp(_bsr_fwd, _bsr_bwd)


PALLAS_IMPLS = {BSR: spmm_bsr}
