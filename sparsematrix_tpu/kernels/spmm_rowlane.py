"""Row-lane SpMM — the slab SpMV layout reused for k dense RHS columns.

For densities below the densify threshold (~5%) with small/medium k, the
XLA segment-sum SpMM measures ~0.09 Gnnz/s and the blocked-ELL layout
drowns in block padding.  This kernel walks the SAME slabs as
``spmv_rowlane`` once per RHS column: the gather indices are shared, only
the x window changes (X is staged transposed so each (column, window)
pane is a native (8, 128) tile).  Compute scales with nnz×k (every entry
feeds k MACs), so per-MAC cost matches the SpMV kernel.

Reuses ``SellRowLane`` packs — one pack serves both spmv and spmm.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from .spmv_rowlane import _LANES, _W, SellRowLane

__all__ = ["spmm_rowlane"]


def _rowlane_mm_kernel(tile_ref, win_ref, sidx_ref, vals_ref, xt_ref, o_ref,
                       *, group: int, k: int, s_rows: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def col_body(j, _):
        acc = jnp.zeros((8, _LANES), jnp.float32)
        for b in range(group):
            w = win_ref[g * group + b]
            xw = xt_ref[pl.ds(j * s_rows + w * 8, 8), :]
            sidx = sidx_ref[0, b * 8 : (b + 1) * 8, :]
            gth = jnp.take_along_axis(xw, sidx, axis=1)
            acc = acc + vals_ref[0, b * 8 : (b + 1) * 8, :] * gth
        part = jnp.sum(acc, axis=0, keepdims=True)  # (1, 128)
        o_ref[pl.ds(j, 1), :] = o_ref[pl.ds(j, 1), :] + part.astype(
            o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k, col_body, 0)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "k",
                                             "interpret"))
def _rowlane_mm_call(group_tile, slab_win, s_idx, vals, xt, *, group,
                     n_tiles, k, interpret=False):
    n_groups = s_idx.shape[0]
    s_rows = xt.shape[0] // k
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X^T panes (k*S, 128)
        ],
        out_specs=pl.BlockSpec((k, _LANES), lambda g, t, w: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_rowlane_mm_kernel, group=group, k=k,
                          s_rows=s_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * k, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, slab_win.reshape(-1), s_idx, vals, xt)


def spmm_rowlane(packed: SellRowLane, X):
    """``Y = A @ X`` over a row-lane pack; X is (n, k) dense.

    Lane ``l`` of output tile t holds row ``t*T + l % T`` (as in spmv);
    each output (k, 128) tile stacks the k per-column row sums.
    """
    if packed.lanes_per_row != 1:
        raise ValueError("spmm_rowlane requires a lanes_per_row=1 pack")
    if packed.spill is not None and packed.spill.nnz:
        raise ValueError("spmm_rowlane does not support spilled packs")
    rows, cols = packed.shape
    k = X.shape[1]
    S = packed.n_win * 8
    # X^T staged as (k*S, 128): pane (j, w) at rows [j*S + w*8, +8)
    Xp = jnp.zeros((S * _LANES, k), X.dtype).at[:cols].set(X)
    xt = Xp.T.reshape(k * S, _LANES)
    n_groups = packed.s_idx.shape[0]
    from .spmv_rowlane import _max_groups_per_call

    chunk = _max_groups_per_call(packed.group)
    y = jnp.zeros((packed.n_tiles, k, _LANES), jnp.float32)
    for g0 in range(0, n_groups, chunk):
        g1 = min(g0 + chunk, n_groups)
        out = _rowlane_mm_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.s_idx[g0:g1], packed.vals[g0:g1], xt,
            group=packed.group, n_tiles=packed.n_tiles, k=k,
            interpret=config.interpret(),
        )
        out = out.reshape(packed.n_tiles, k, _LANES)
        touched = (
            jnp.zeros(packed.n_tiles, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        y = y + jnp.where(touched[:, None, None], out, 0)
    # (n_tiles, k, 128) → rows × k
    return y.transpose(0, 2, 1).reshape(packed.n_tiles * _LANES, k)[:rows]
