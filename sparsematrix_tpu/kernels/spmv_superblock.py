"""Superblock row-lane SpMV — for programs with ~1 slab per output tile.

The row-lane kernel (spmv_rowlane.py) batches ``group`` slabs per grid
step, but all slabs of a step must target the SAME 128-row output tile —
so a matrix whose tiles own only 1-2 slabs (clustered SpGEMM pair
programs: 862 k pairs → 10 442 slabs over 6 093 tiles) degenerates to
group=1 and pays one ~300-600 ns grid step per slab; the measured 6.1 ms
numeric phase is ~95 % grid-step overhead over an ~84 µs DMA floor.

This variant widens the output block to ``K`` tiles (a *superblock* of
(8·K, 128)), so one grid step batches slabs from ANY tiles inside the
superblock: per slab, the row sums (one sublane reduction, lanes are row
slots as in spmv_rowlane) are accumulated into sublane ``8·tloc`` of the
output block with an aligned 8-sublane read-modify-write.  Slab padding
is per superblock instead of per tile, so large ``group`` costs ~nothing
even at 1-2 slabs/tile.  Grid steps shrink ~group·K/(slabs-per-tile)×.

Same gather legality as spmv_rowlane (axis-1 (8,128) take_along_axis,
int8 indices); x layout and slab encoding are identical, so
``pack_superblock`` simply regroups a group=1 row-lane pack.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats.base import register_sparse_pytree
from ..formats.csr import CSR

__all__ = ["SellSuperblock", "pack_superblock", "spmv_superblock"]

_LANES = 128
_W = 1024


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SellSuperblock:
    s_idx: jnp.ndarray  # (n_groups, group*8, 128) int8
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_super: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_groups*group,) int32
    slab_tloc: jnp.ndarray  # (n_groups*group,) int32 — tile % K
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_super: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    k_tiles: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        return self.nnz / max(self.vals.size, 1)


def pack_superblock(csr: CSR, group: int = 16, k_tiles: int = 16,
                    dtype=None) -> SellSuperblock:
    """Pack CSR row-lane (lanes_per_row=1), regrouped into superblocks of
    ``k_tiles`` output tiles with ``group`` slabs per grid step."""
    from .spmv_rowlane import _pack_arrays, _pack_arrays_native

    sp = csr.to_scipy().tocoo()
    rows, cols = sp.shape
    r = sp.row.astype(np.int64)
    c = sp.col.astype(np.int64)
    v = sp.data
    arrs = None
    if r.size:
        arrs = _pack_arrays_native(r, c, v, rows, cols, 1, 1)
    if arrs is None:
        arrs = _pack_arrays(r, c, v, rows, cols, 1, 1, v.dtype)
    n_tiles, n_win = arrs["n_tiles"], arrs["n_win"]
    sidx = np.asarray(arrs["s_idx"]).reshape(-1, 8, _LANES)
    vals = np.asarray(arrs["vals"]).reshape(-1, 8, _LANES)
    tiles = np.asarray(arrs["group_tile"]).astype(np.int64)
    wins = np.asarray(arrs["slab_win"]).reshape(-1).astype(np.int64)

    n_super = max(-(-n_tiles // k_tiles), 1)
    sb = tiles // k_tiles  # slabs are tile-major → superblock-major too
    counts = np.bincount(sb, minlength=n_super)
    padded = -(-counts // group) * group
    offset = np.concatenate([[0], np.cumsum(padded)])
    first = np.concatenate([[0], np.cumsum(counts)])[:-1]
    slot = offset[sb] + (np.arange(len(sb)) - first[sb])
    total = int(offset[-1])
    n_groups = total // group

    vnp = vals.dtype if dtype is None else np.dtype(dtype)
    s_idx_a = np.zeros((total, 8, _LANES), np.int8)
    vals_a = np.zeros((total, 8, _LANES), vnp)
    win_a = np.zeros(total, np.int32)
    tloc_a = np.zeros(total, np.int32)
    s_idx_a[slot] = sidx
    vals_a[slot] = vals.astype(vnp)
    win_a[slot] = wins
    tloc_a[slot] = tiles % k_tiles
    # padding slots: keep win/tloc at a value used by their superblock so
    # the gather and the RMW stay in range (zero vals contribute nothing)
    pad = np.ones(total, bool)
    pad[slot] = False
    if pad.any():
        pad_sb = np.searchsorted(offset[1:], np.nonzero(pad)[0],
                                 side="right")
        last = np.zeros(n_super, np.int64)
        nonempty = counts > 0
        last_idx = first + counts - 1
        last[nonempty] = last_idx[nonempty]
        win_a[pad] = wins[last[pad_sb]] if len(wins) else 0
        tloc_a[pad] = (tiles[last[pad_sb]] % k_tiles) if len(tiles) else 0

    group_super = np.repeat(np.arange(n_super), padded // group)
    return SellSuperblock(
        s_idx=jnp.asarray(s_idx_a.reshape(n_groups, group * 8, _LANES)),
        vals=jnp.asarray(vals_a.reshape(n_groups, group * 8, _LANES)),
        group_super=jnp.asarray(group_super, jnp.int32),
        slab_win=jnp.asarray(win_a, jnp.int32),
        slab_tloc=jnp.asarray(tloc_a, jnp.int32),
        shape=(rows, cols),
        n_tiles=n_tiles,
        n_super=n_super,
        n_win=n_win,
        group=group,
        k_tiles=k_tiles,
        nnz=csr.nnz,
    )


def _superblock_kernel(super_ref, win_ref, tloc_ref, sidx_ref, vals_ref,
                       x_ref, o_ref, *, group: int, k_tiles: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, super_ref[g] != super_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    for b in range(group):
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        sidx = sidx_ref[0, b * 8 : (b + 1) * 8, :]
        gth = jnp.take_along_axis(xw, sidx, axis=1)
        prod = vals_ref[0, b * 8 : (b + 1) * 8, :].astype(jnp.float32) * gth
        part = jnp.sum(prod, axis=0, keepdims=True)  # (1, 128) row sums
        base = pl.multiple_of(tloc_ref[g * group + b] * 8, 8)
        blk = o_ref[pl.ds(base, 8), :]
        o_ref[pl.ds(base, 8), :] = blk + jnp.where(sub == 0, part, 0.0)


@functools.partial(jax.jit, static_argnames=("group", "k_tiles", "n_super",
                                             "interpret"))
def _superblock_call(group_super, slab_win, slab_tloc, s_idx, vals, xp, *,
                     group, k_tiles, n_super, interpret=False):
    n_groups = s_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, s, w, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, s, w, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x (S,128)
        ],
        out_specs=pl.BlockSpec((8 * k_tiles, _LANES),
                               lambda g, s, w, t: (s[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_superblock_kernel, group=group, k_tiles=k_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * 8 * k_tiles, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(group_super, slab_win, slab_tloc, s_idx, vals, xp)


def _superblock_forward(packed: SellSuperblock, x):
    rows, cols = packed.shape
    S = packed.n_win * 8
    xp = (jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x)
          .reshape(S, _LANES))
    out = _superblock_call(
        packed.group_super, packed.slab_win, packed.slab_tloc,
        packed.s_idx, packed.vals, xp,
        group=packed.group, k_tiles=packed.k_tiles, n_super=packed.n_super,
        interpret=config.interpret(),
    )
    # sublane 0 of each tile block carries the row sums; superblocks no
    # slab ever visits keep uninitialized VMEM — mask them to 0 (k-split
    # distributed pair programs leave whole superblocks to other shards)
    y = out.reshape(packed.n_super * packed.k_tiles, 8, _LANES)[:, 0, :]
    touched = (jnp.zeros(packed.n_super, bool)
               .at[packed.group_super].set(True))
    y = jnp.where(jnp.repeat(touched, packed.k_tiles)[:, None], y, 0.0)
    return y.reshape(-1)[:rows]


def _slot_row_col(packed: SellSuperblock):
    """Per-slot (row, col) ids reconstructed from the slab metadata."""
    n_groups, GH, _ = packed.s_idx.shape
    group = packed.group
    lane = jnp.arange(_LANES)[None, None, :]
    tile = (packed.group_super[:, None] * packed.k_tiles
            + packed.slab_tloc.reshape(n_groups, group))  # (n_groups, group)
    tile = jnp.repeat(tile, 8, axis=1)[:, :, None]  # (n_groups, GH, 1)
    row = tile * _LANES + lane
    subl = (jnp.arange(GH) % 8)[None, :, None]
    winb = jnp.repeat(packed.slab_win.reshape(n_groups, group), 8,
                      axis=1)[:, :, None]
    col = winb * _W + subl * _LANES + packed.s_idx.astype(jnp.int32)
    return jnp.broadcast_to(row, col.shape), col


@jax.custom_vjp
def spmv_superblock(packed: SellSuperblock, x):
    """``y = A @ x`` on the superblock layout (differentiable in x and
    ``packed.vals``)."""
    return _superblock_forward(packed, x)


def _superblock_fwd(packed, x):
    return _superblock_forward(packed, x), (packed, x)


def _superblock_bwd(res, g):
    packed, x = res
    rows, cols = packed.shape
    row, col = _slot_row_col(packed)
    gpad = (jnp.zeros((packed.n_super * packed.k_tiles * _LANES,), g.dtype)
            .at[:rows].set(g))
    xpad = jnp.zeros((packed.n_win * _W,), x.dtype).at[:cols].set(x)
    vals_f = packed.vals.astype(jnp.float32)
    gx = (jnp.zeros((packed.n_win * _W,), jnp.float32)
          .at[col.reshape(-1)]
          .add((gpad[row] * vals_f).reshape(-1)))[:cols].astype(x.dtype)
    mask = packed.vals != 0
    dvals = jnp.where(mask, xpad[col] * gpad[row], 0).astype(
        packed.vals.dtype)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(dpacked, vals=dvals)
    return dpacked, gx


spmv_superblock.defvjp(_superblock_fwd, _superblock_bwd)
