"""Pallas SpMM kernels.

The flagship MXU path: BlockedELL × dense RHS.  Each grid step owns one
block-row of the sparse matrix and accumulates ``sum_m blocks[i,m] @
X[block_cols[i,m]]`` on the systolic array.  This is the TPU-native
replacement for the reference's per-nonzero AXPY hot loop
(/root/reference/src/sparse/kernel.cc:771-800): instead of streaming scalar
(delta, idx) pairs, indices select (bk × k) RHS tiles and the MXU contracts
whole (bm × bk) blocks.

Padding block slots carry ``block_col = 0`` and zero values, so they
contribute exactly 0 (sentinel-zero design, sparse-matrix.cc:29-31) —
no masking in the inner loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats import BlockedELL

__all__ = ["spmm_blocked_ell", "PALLAS_IMPLS"]


def _bell_kernel(bc_ref, blocks_ref, x_ref, o_ref, *, bk: int, bm: int,
                 n_blocks: int, rows_per_step: int, precision):
    step = pl.program_id(0)
    # ``rows_per_step`` block-rows share one grid step (fewer ~0.3-0.6 µs
    # step costs; at the MXU-native (128,128) block shape one block-row
    # per step spent roughly half the kernel in step overhead)
    for g in range(rows_per_step):
        i = step * rows_per_step + g

        def body(m, acc, i=i, g=g):
            bc = bc_ref[i, m]
            xt = x_ref[pl.ds(bc * bk, bk), :]
            blk = blocks_ref[0, g, m]
            return acc + jnp.dot(
                blk, xt, preferred_element_type=jnp.float32,
                precision=precision,
            )

        acc0 = jnp.zeros((bm, o_ref.shape[1]), jnp.float32)
        acc = jax.lax.fori_loop(0, n_blocks, body, acc0)
        o_ref[pl.ds(g * bm, bm), :] = acc.astype(o_ref.dtype)


def _matmul_precision(dtype):
    # v5e MXU natively multiplies bf16; fp32 operands need the multi-pass
    # HIGHEST precision to deliver fp32-grade results (the reference is an
    # fp32 library — its oracle tolerance assumes fp32 arithmetic).
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


# block-rows batched per grid step (module knob; sweepable on chip —
# static arg keeps jit caches correct)
_ROWS_PER_STEP = 4


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_step"))
def _spmm_bell_call(block_cols, blocks, Xp, *, interpret=False,
                    rows_per_step=1):
    nbr, M, bm, bk = blocks.shape
    k = Xp.shape[1]
    G = rows_per_step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_cols
        grid=(nbr // G,),
        in_specs=[
            pl.BlockSpec(
                (1, G, M, bm, bk),
                lambda i, bc: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full X
        ],
        out_specs=pl.BlockSpec(
            (G * bm, k), lambda i, bc: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _bell_kernel,
            bk=bk,
            bm=bm,
            n_blocks=M,
            rows_per_step=G,
            precision=_matmul_precision(Xp.dtype),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, k), Xp.dtype),
        interpret=interpret,
    )(block_cols, blocks.reshape(nbr // G, G, M, bm, bk), Xp)


def _spmm_bell_forward(A: BlockedELL, X):
    bm, bk = A.block_shape
    nbr, M = A.block_cols.shape
    nbc = -(-A.shape[1] // bk)
    k = X.shape[1]
    Xp = jnp.zeros((nbc * bk, k), X.dtype).at[: A.shape[1]].set(X)
    # largest batch that divides the block-row count — padding instead
    # would concatenate a fresh copy of the whole blocks array per call
    G = 1
    for g in range(min(_ROWS_PER_STEP, nbr), 0, -1):
        if nbr % g == 0:
            G = g
            break
    out = _spmm_bell_call(A.block_cols, A.blocks, Xp,
                          interpret=config.interpret(), rows_per_step=G)
    return out[: A.shape[0]]


@jax.custom_vjp
def spmm_blocked_ell(A: BlockedELL, X):
    """``Y = A @ X`` on the MXU via the blocked-ELL layout.

    Differentiable in both the stored blocks and ``X`` (block-granular
    XLA gathers/scatters in the backward pass — the fast regime per the
    BSR einsum measurements; the forward stays on the Pallas kernel)."""
    return _spmm_bell_forward(A, X)


def _bell_fwd(A, X):
    return _spmm_bell_forward(A, X), (A, X)


def _bell_bwd(res, g):
    import numpy as np

    A, X = res
    bm, bk = A.block_shape
    nbr, M = A.block_cols.shape
    nbc = -(-A.shape[1] // bk)
    k = X.shape[1]
    prec = _matmul_precision(X.dtype)
    gp = jnp.zeros((nbr * bm, k), g.dtype).at[: g.shape[0]].set(g)
    gb = gp.reshape(nbr, bm, k)
    blocks_m = jnp.where(A.valid[:, :, None, None], A.blocks, 0)
    # dX[j-tile] += block(i,m)^T @ g-rowblock(i) for every stored block
    contrib = jnp.einsum("rmij,rik->rmjk", blocks_m, gb, precision=prec)
    dXp = (
        jnp.zeros((nbc, bk, k), X.dtype)
        .at[A.block_cols.reshape(-1)]
        .add(contrib.reshape(nbr * M, bk, k))
    )
    dX = dXp.reshape(nbc * bk, k)[: A.shape[1]]
    # dblocks(i,m) = g-rowblock(i) @ x-tile(block_cols[i,m])^T
    Xp = jnp.zeros((nbc * bk, k), X.dtype).at[: A.shape[1]].set(X)
    Xt = Xp.reshape(nbc, bk, k)[A.block_cols]  # (nbr, M, bk, k)
    dblocks = jnp.einsum("rik,rmjk->rmij", gb, Xt, precision=prec)
    dblocks = jnp.where(A.valid[:, :, None, None], dblocks, 0)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dA = jax.tree_util.tree_map(ct_zero, A)
    import dataclasses

    dA = dataclasses.replace(dA, blocks=dblocks.astype(A.blocks.dtype))
    return dA, dX


spmm_blocked_ell.defvjp(_bell_fwd, _bell_bwd)


PALLAS_IMPLS = {
    BlockedELL: spmm_blocked_ell,
}
