"""Pallas SpMV kernel — lane-bucketed SELL slabs.

XLA's gather + segment_sum SpMV measures ~0.06 Gnnz/s on v5e (0.1% of the
HBM roofline): both its per-element gather of x and the scatter-add lower
to effectively scalar loops.  This kernel replaces them with vector ops
under Mosaic's hard constraint that ``dynamic_gather`` only compiles at a
single (8, 128) vreg (see CLAUDE.md):

  * x is viewed as (S, 128) and processed in aligned 1024-element
    **windows** (8 sublanes × 128 lanes).
  * Matrix rows are grouped into **tiles** of TR rows.  Each (tile,
    window) bucket's entries are packed into (8, 128) **slabs** where an
    entry with column c sits in lane ``c % 128`` and stores its window
    sublane ``(c % 1024) // 128`` — so one legal ``take_along_axis``
    against the window's (8, 128) x-tile gathers 1024 entries at once.
  * Per-slab metadata packs sublane index and tile-local row into one
    int32 (``s_idx | row << 3``); values carry the matrix data (padding
    slots hold value 0 → harmless anywhere).
  * Reduction is in-register: TR masked sums per slab (VPU compares), with
    the output row-tile accumulated across consecutive slabs of the same
    tile via Pallas's output-revisiting guarantee (slabs are sorted by
    tile at pack time).

Traffic ≈ 8 B per slab slot; efficiency scales with slab fill rate, which
the packer reports (high for banded/structured or ≥64 nnz/row matrices;
for very sparse rows prefer larger TR).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats.base import register_sparse_pytree
from ..formats.csr import CSR

__all__ = ["SellSpmv", "pack_sell", "spmv_sell"]

_W = 1024  # x window (8 sublanes × 128 lanes)
_LANES = 128


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SellSpmv:
    """Packed slab layout for the SpMV kernel (built once per structure)."""

    meta: jnp.ndarray  # (n_slabs, 8, 128) int32: s_idx | row_local << 3
    vals: jnp.ndarray  # (n_slabs, 8, 128)
    slab_tile: jnp.ndarray  # (n_slabs,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_slabs,) int32
    tile_nonempty: jnp.ndarray  # (n_tiles,) bool
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    tr: int = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        """Fraction of slab slots holding real entries."""
        return self.nnz / max(self.vals.size, 1)


def pack_sell(csr: CSR, tr: int = 32) -> SellSpmv:
    """Host-side packer: CSR → lane-bucketed slabs.

    ``tr`` (rows per tile) trades reduction cost (tr masked sums per slab)
    against fill rate — pick roughly ``tr * nnz_per_row ≳ 2048``.
    ``tr`` ≤ 128 (row sums occupy lanes of one output vreg).
    """
    if not 1 <= tr <= 128:
        raise ValueError("tr must be in [1, 128]")
    sp = csr.to_scipy().tocsr()
    rows, cols = sp.shape
    n_tiles = -(-rows // tr)
    n_win = max(-(-cols // _W), 1)
    slabs_meta = []
    slabs_vals = []
    slab_tile = []
    slab_win = []
    tile_nonempty = np.zeros(n_tiles, dtype=bool)
    coo = sp.tocoo()
    # bucket entries by (tile, window)
    order = np.lexsort((coo.col, coo.col // _W, coo.row // tr))
    r = coo.row[order]
    c = coo.col[order]
    v = coo.data[order]
    t_ids = r // tr
    w_ids = c // _W
    # group boundaries
    keys = t_ids.astype(np.int64) * n_win + w_ids
    boundaries = np.nonzero(np.diff(keys))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(keys)]])
    for s0, e0 in zip(starts, ends):
        if e0 == s0:
            continue
        t = int(t_ids[s0])
        w = int(w_ids[s0])
        tile_nonempty[t] = True
        # lane buckets; position within a lane = occurrence index among
        # same-lane entries (vectorized run-index, no per-entry loop)
        lanes = c[s0:e0] % _LANES
        subl = (c[s0:e0] % _W) // _LANES
        rloc = r[s0:e0] - t * tr
        vv = v[s0:e0]
        depth = np.bincount(lanes, minlength=_LANES)
        n_slabs = max(int(-(-depth.max() // 8)), 1)
        meta = np.zeros((n_slabs, 8, _LANES), dtype=np.int64)
        vals = np.zeros((n_slabs, 8, _LANES), dtype=v.dtype)
        lorder = np.argsort(lanes, kind="stable")
        lsort = lanes[lorder]
        newl = np.empty(len(lsort), bool)
        if len(lsort):
            newl[0] = True
            newl[1:] = lsort[1:] != lsort[:-1]
        rstart = np.maximum.accumulate(
            np.where(newl, np.arange(len(lsort)), 0))
        pos = np.arange(len(lsort)) - rstart
        meta[pos // 8, pos % 8, lsort] = subl[lorder] | (rloc[lorder] << 3)
        vals[pos // 8, pos % 8, lsort] = vv[lorder]
        for k in range(n_slabs):
            slabs_meta.append(meta[k])
            slabs_vals.append(vals[k])
            slab_tile.append(t)
            slab_win.append(w)
    if not slabs_meta:  # all-zero matrix
        slabs_meta.append(np.zeros((8, _LANES), np.int64))
        slabs_vals.append(np.zeros((8, _LANES), sp.data.dtype))
        slab_tile.append(0)
        slab_win.append(0)
    return SellSpmv(
        meta=jnp.asarray(np.stack(slabs_meta), jnp.int32),
        vals=jnp.asarray(np.stack(slabs_vals)),
        slab_tile=jnp.asarray(slab_tile, jnp.int32),
        slab_win=jnp.asarray(slab_win, jnp.int32),
        tile_nonempty=jnp.asarray(tile_nonempty),
        shape=(rows, cols),
        tr=tr,
        n_tiles=n_tiles,
        n_win=n_win,
        nnz=csr.nnz,
    )


def _sell_kernel(tile_ref, win_ref, meta_ref, vals_ref, x_ref, o_ref, *,
                 tr: int):
    s = pl.program_id(0)

    @pl.when(jnp.logical_or(s == 0, tile_ref[s] != tile_ref[s - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = win_ref[s]
    xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]  # (8, 128) window tile
    meta = meta_ref[0]
    s_idx = meta & 7
    rloc = meta >> 3
    g = jnp.take_along_axis(xw, s_idx, axis=0)  # legal (8,128) gather
    contrib = vals_ref[0] * g
    # masked per-row sums scattered to lane p of sublane 0 of the output
    # tile; padding slots have value 0 → row 0 unharmed
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    sums = jnp.zeros((8, _LANES), contrib.dtype)
    for p in range(tr):
        s_p = jnp.sum(jnp.where(rloc == p, contrib, 0.0))
        sums = jnp.where((subl == 0) & (lane == p), s_p, sums)
    o_ref[:] = o_ref[:] + sums.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tr", "n_tiles", "interpret"))
def _sell_call(slab_tile, slab_win, meta, vals, xp, *, tr, n_tiles,
               interpret=False):
    n_slabs = meta.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec((1, 8, _LANES), lambda s, t, w: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LANES), lambda s, t, w: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x (S,128)
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda s, t, w: (t[s], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_sell_kernel, tr=tr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), vals.dtype),
        interpret=interpret,
    )(slab_tile, slab_win, meta, vals, xp)


def spmv_sell(packed: SellSpmv, x):
    """``y = A @ x`` via the packed slab layout."""
    rows, cols = packed.shape
    S = packed.n_win * 8
    xp = jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x).reshape(S, _LANES)
    out = _sell_call(
        packed.slab_tile, packed.slab_win, packed.meta, packed.vals, xp,
        tr=packed.tr, n_tiles=packed.n_tiles, interpret=config.interpret(),
    )
    # per-tile sums live in sublane 0, lanes [0, tr) of each (8,128) tile
    out = out.reshape(packed.n_tiles, 8, _LANES)[:, 0, : packed.tr]
    # tiles with no slabs were never visited — mask them to zero
    out = jnp.where(packed.tile_nonempty[:, None], out, 0)
    return out.reshape(packed.n_tiles * packed.tr)[:rows]


# ---------------------------------------------------------------------------
# Row-pure variant: one matrix row per sublane.
#
# The masked-sum reduction above costs ~tr VPU passes per slab and measures
# grid/compute-bound (~240 ns/slab vs ~10 ns of HBM traffic).  Here each
# sublane of a slab holds entries of exactly ONE matrix row (tile row u),
# so the whole reduction is a single ``sum(axis=1)``; lane collisions
# within a row spill to additional slabs of the same (tile, window), and
# ``group`` slabs are processed per grid step to amortize step overhead.
# Best for ≥32 nnz/row; below that the masked-sum variant's tr knob wins.
# ---------------------------------------------------------------------------


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SellRowPure:
    s_idx: jnp.ndarray  # (n_groups, group*8, 128) int8 window sublanes
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_groups, group) int32
    tile_nonempty: jnp.ndarray  # (n_tiles,) bool
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})
    rows_per_sublane: int = dataclasses.field(default=1,
                                              metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        return self.nnz / max(self.vals.size, 1)


def pack_sell_rowpure(csr: CSR, group: int = 4,
                      rows_per_sublane: int = 1) -> SellRowPure:
    """Pack CSR into row-pure slabs, ``group`` slabs per grid step.

    ``rows_per_sublane`` (R ∈ {1,2,4,8,16}): sublane u serves rows
    u + 8j of an 8R-row tile, with j packed into spare s_idx bits —
    R× better slab fill for ~2R extra VPU passes per slab.  Pick R so
    that ``8R · nnz_per_row ≳ 2 · 1024 · n_windows``.

    Fully vectorized (numpy) — like the reference, encode is a build-time
    host operation, but it must not be a per-entry Python loop at
    multi-million-nnz scale.
    """
    R = rows_per_sublane
    if R not in (1, 2, 4, 8, 16):
        raise ValueError("rows_per_sublane must be 1/2/4/8/16")
    sp = csr.to_scipy().tocoo()
    rows, cols = sp.shape
    n_tiles = -(-rows // (8 * R))
    n_win = max(-(-cols // _W), 1)
    r = sp.row.astype(np.int64)
    c = sp.col.astype(np.int64)
    v = sp.data
    if r.size == 0:
        # all-zero matrix: one empty group
        return SellRowPure(
            s_idx=jnp.zeros((1, group * 8, _LANES), jnp.int8),
            vals=jnp.zeros((1, group * 8, _LANES), sp.data.dtype),
            group_tile=jnp.zeros((1,), jnp.int32),
            slab_win=jnp.zeros((1, group), jnp.int32),
            tile_nonempty=jnp.zeros((n_tiles,), bool),
            shape=(rows, cols), n_tiles=n_tiles, n_win=n_win, group=group,
            nnz=0, rows_per_sublane=R,
        )
    t = r // (8 * R)
    u = r % 8
    j = (r % (8 * R)) // 8  # which of the R rows this sublane serves
    w = c // _W
    lane = c % _LANES
    subl = (c % _W) // _LANES
    # depth = occurrence index among duplicates of (t, w, u, lane)
    order = np.lexsort((lane, u, w, t))
    tt, ww, uu, ll = t[order], w[order], u[order], lane[order]
    ss, vv, jj = subl[order], v[order], j[order]
    key = ((tt * n_win + ww) * 8 + uu) * _LANES + ll
    new = np.empty(len(key), bool)
    new[0] = True
    new[1:] = key[1:] != key[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(key)), 0))
    d = np.arange(len(key)) - run_start
    # slab identity = (t, w, d); unique keys sort t-major (w, d within) ✓
    d_span = int(d.max()) + 1
    skey = (tt * n_win + ww) * d_span + d
    uskey, inv = np.unique(skey, return_inverse=True)
    slab_t = uskey // (n_win * d_span)
    slab_w = (uskey // d_span) % n_win
    n_slabs = len(uskey)
    # pad each non-empty tile's slab list to a multiple of `group`
    counts = np.bincount(slab_t, minlength=n_tiles)
    tile_groups = -(-counts // group)  # 0 for empty tiles
    padded = tile_groups * group
    tile_offset = np.concatenate([[0], np.cumsum(padded)])
    # rank of each slab within its tile
    first_of_tile = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(n_slabs) - first_of_tile[slab_t]
    slab_slot = tile_offset[slab_t] + rank
    total_slots = int(tile_offset[-1])
    n_groups = total_slots // group

    sidx = np.zeros((total_slots, 8, _LANES), np.int8)
    vals = np.zeros((total_slots, 8, _LANES), v.dtype)
    win = np.zeros(total_slots, np.int64)
    entry_slot = slab_slot[inv]
    sidx[entry_slot, uu, ll] = ss | (jj << 3)  # j in spare bits
    vals[entry_slot, uu, ll] = vv
    win[slab_slot] = slab_w
    group_tile = np.repeat(np.arange(n_tiles), tile_groups)
    return SellRowPure(
        s_idx=jnp.asarray(
            sidx.reshape(n_groups, group * 8, _LANES), jnp.int8
        ),
        vals=jnp.asarray(vals.reshape(n_groups, group * 8, _LANES)),
        group_tile=jnp.asarray(group_tile, jnp.int32),
        slab_win=jnp.asarray(win.reshape(n_groups, group), jnp.int32),
        tile_nonempty=jnp.asarray(counts > 0),
        shape=(rows, cols),
        n_tiles=n_tiles,
        n_win=n_win,
        group=group,
        nnz=csr.nnz,
        rows_per_sublane=R,
    )


def _rowpure_kernel(tile_ref, win_ref, sidx_ref, vals_ref, x_ref, o_ref, *,
                    group: int, rows_per_sublane: int):
    g = pl.program_id(0)
    R = rows_per_sublane

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    # row sums accumulate directly into lanes [0, R) of an (8, 128) tile
    # (no in-kernel scatter: Mosaic has no scatter-add — select instead)
    sums = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        # win_ref is flat (n_groups*group,): 2-D SMEM prefetch arrays get
        # lane-padded to 128 (16x waste) — 1-D arrays don't
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        meta = sidx_ref[0, b * 8 : (b + 1) * 8, :].astype(jnp.int32)
        sidx = meta & 7
        jsel = meta >> 3
        gth = jnp.take_along_axis(xw, sidx, axis=0)
        contrib = vals_ref[0, b * 8 : (b + 1) * 8, :] * gth
        if R == 1:
            s0 = jnp.sum(contrib, axis=1, keepdims=True)
            sums = jnp.where(lane == 0, sums + s0, sums)
        else:
            for j_ in range(R):
                s_j = jnp.sum(jnp.where(jsel == j_, contrib, 0.0), axis=1,
                              keepdims=True)
                sums = jnp.where(lane == j_, sums + s_j, sums)
    o_ref[:] = o_ref[:] + sums.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles",
                                             "rows_per_sublane", "interpret"))
def _rowpure_call(group_tile, slab_win, s_idx, vals, xp, *, group, n_tiles,
                  rows_per_sublane=1, interpret=False):
    n_groups = s_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda g, t, w: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_rowpure_kernel, group=group,
                          rows_per_sublane=rows_per_sublane),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), vals.dtype),
        interpret=interpret,
    )(group_tile, slab_win.reshape(-1), s_idx, vals, xp)


# scalar-prefetch arrays live in SMEM (~1 MB); cap per-call group count so
# group_tile + slab_win fit with headroom
_MAX_GROUPS_PER_CALL = 24_000


@jax.custom_vjp
def spmv_sell_rowpure(packed: SellRowPure, x):
    """``y = A @ x`` via the row-pure slab layout (differentiable: the
    backward pass reconstructs (row, col) per slot from the slab metadata
    and runs XLA scatter/gather — correct everywhere, fast path not
    required for gradients; prefer ``spmv_sell_rowlane`` with a
    transposed pack for training loops)."""
    return _rowpure_forward(packed, x)


def _rowpure_forward(packed: SellRowPure, x):
    """Forward pass implementation.

    Large matrices are processed in segments of ≤ _MAX_GROUPS_PER_CALL
    groups (SMEM capacity for the prefetched metadata); segment outputs
    are summed — safe because every kernel call zero-initializes the tiles
    it touches and untouched tiles are masked to zero.
    """
    rows, cols = packed.shape
    R = packed.rows_per_sublane
    S = packed.n_win * 8
    xp = jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x).reshape(S, _LANES)
    n_groups = packed.s_idx.shape[0]
    y = jnp.zeros((packed.n_tiles * 8 * R,), packed.vals.dtype)
    for g0 in range(0, n_groups, _MAX_GROUPS_PER_CALL):
        g1 = min(g0 + _MAX_GROUPS_PER_CALL, n_groups)
        out = _rowpure_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.s_idx[g0:g1], packed.vals[g0:g1], xp,
            group=packed.group, n_tiles=packed.n_tiles,
            rows_per_sublane=R, interpret=config.interpret(),
        )
        # lanes [0, R) of each (8,128) tile hold rows t*8R + j*8 + u
        out = out.reshape(packed.n_tiles, 8, _LANES)[:, :, :R]
        # zero tiles this segment never visited (their output is garbage);
        # jit-safe scatter (group_tile may be traced)
        touched = (
            jnp.zeros(packed.n_tiles, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        out = jnp.where(touched[:, None, None], out, 0)
        y = y + out.transpose(0, 2, 1).reshape(packed.n_tiles * 8 * R)
    return y[:rows]


def _rowpure_slot_coords(packed: SellRowPure):
    """Per-slot (row, col) reconstructed from the slab metadata."""
    R = packed.rows_per_sublane
    n_groups, GH, _ = packed.s_idx.shape
    meta = packed.s_idx.astype(jnp.int32)
    ss = meta & 7
    jj = meta >> 3
    lane = jnp.arange(_LANES)[None, None, :]
    subl = (jnp.arange(GH) % 8)[None, :, None]
    winb = jnp.repeat(packed.slab_win.reshape(n_groups, packed.group),
                      8, axis=1)[:, :, None]
    col = winb * _W + ss * _LANES + lane
    row = packed.group_tile[:, None, None] * 8 * R + jj * 8 + subl
    return row, col


def _rowpure_fwd(packed, x):
    return _rowpure_forward(packed, x), (packed, x)


def _rowpure_bwd(res, g):
    packed, x = res
    rows, cols = packed.shape
    row, col = _rowpure_slot_coords(packed)
    gpad = jnp.zeros((packed.n_tiles * 8 * packed.rows_per_sublane,),
                    g.dtype).at[:rows].set(g)
    gx = (
        jnp.zeros((cols,), x.dtype)
        .at[jnp.clip(col, 0, cols - 1).reshape(-1)]
        .add((gpad[row] * packed.vals).reshape(-1))
    )
    xpad = jnp.zeros((packed.n_win * _W,), x.dtype).at[:cols].set(x)
    mask = packed.vals != 0
    dvals = jnp.where(mask, xpad[col] * gpad[row], 0)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(dpacked,
                                  vals=dvals.astype(packed.vals.dtype))
    return dpacked, gx


spmv_sell_rowpure.defvjp(_rowpure_fwd, _rowpure_bwd)


PALLAS_IMPLS: dict = {}
