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


def _spmm_bsr_forward(A: BSR, X):
    bm, bn = A.block_shape
    nbr = A.num_block_rows
    nbc = -(-A.shape[1] // bn)
    k = X.shape[1]
    Xp = jnp.zeros((nbc * bn, k), X.dtype).at[: A.shape[1]].set(X)
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
