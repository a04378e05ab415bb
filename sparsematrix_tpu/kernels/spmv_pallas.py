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
        # lane buckets
        lanes = c[s0:e0] % _LANES
        subl = (c[s0:e0] % _W) // _LANES
        rloc = r[s0:e0] - t * tr
        vv = v[s0:e0]
        depth = np.bincount(lanes, minlength=_LANES)
        n_slabs = max(int(-(-depth.max() // 8)), 1)
        meta = np.zeros((n_slabs, 8, _LANES), dtype=np.int64)
        vals = np.zeros((n_slabs, 8, _LANES), dtype=v.dtype)
        fill = np.zeros(_LANES, dtype=np.int64)
        for i in range(e0 - s0):
            l = lanes[i]
            pos = fill[l]
            fill[l] += 1
            meta[pos // 8, pos % 8, l] = subl[i] | (rloc[i] << 3)
            vals[pos // 8, pos % 8, l] = vv[i]
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
    xw = x_ref[pl.ds(w * 8, 8), :]  # (8, 128) window tile
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
    s_idx: jnp.ndarray  # (n_groups, group, 8, 128) int32 window sublanes
    vals: jnp.ndarray  # (n_groups, group, 8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_groups, group) int32
    tile_nonempty: jnp.ndarray  # (n_tiles,) bool
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        return self.nnz / max(self.vals.size, 1)


def pack_sell_rowpure(csr: CSR, group: int = 8) -> SellRowPure:
    """Pack CSR into row-pure slabs, ``group`` slabs per grid step."""
    sp = csr.to_scipy().tocsr()
    rows, cols = sp.shape
    n_tiles = -(-rows // 8)
    n_win = max(-(-cols // _W), 1)
    per_tile_slabs: list = []  # list of (win, s_idx (8,128), vals (8,128))
    tile_nonempty = np.zeros(n_tiles, dtype=bool)
    all_groups_sidx = []
    all_groups_vals = []
    all_groups_win = []
    group_tile = []
    for t in range(n_tiles):
        r0, r1 = t * 8, min((t + 1) * 8, rows)
        # slabs keyed by (window, depth)
        slabs: dict = {}
        for r in range(r0, r1):
            u = r - r0
            cols_r = sp.indices[sp.indptr[r] : sp.indptr[r + 1]]
            vals_r = sp.data[sp.indptr[r] : sp.indptr[r + 1]]
            # per window, count lane occurrences to route collisions
            lane_seen: dict = {}
            for c, v in zip(cols_r, vals_r):
                w = int(c) // _W
                lane = int(c) % _LANES
                subl = (int(c) % _W) // _LANES
                depth = lane_seen.get((w, u, lane), 0)
                lane_seen[(w, u, lane)] = depth + 1
                key = (w, depth)
                if key not in slabs:
                    slabs[key] = (
                        np.zeros((8, _LANES), np.int64),
                        np.zeros((8, _LANES), sp.data.dtype),
                    )
                si, vv = slabs[key]
                si[u, lane] = subl
                vv[u, lane] = v
        if slabs:
            tile_nonempty[t] = True
            items = [(w, si, vv) for (w, d), (si, vv) in sorted(slabs.items())]
        else:
            items = []
        # pad tile's slab list to a multiple of `group`
        while len(items) % group != 0 or len(items) == 0:
            items.append((0, np.zeros((8, _LANES), np.int64),
                          np.zeros((8, _LANES), sp.data.dtype)))
        for g0 in range(0, len(items), group):
            chunk = items[g0 : g0 + group]
            all_groups_sidx.append(np.stack([c[1] for c in chunk]))
            all_groups_vals.append(np.stack([c[2] for c in chunk]))
            all_groups_win.append([c[0] for c in chunk])
            group_tile.append(t)
    return SellRowPure(
        s_idx=jnp.asarray(np.stack(all_groups_sidx), jnp.int32),
        vals=jnp.asarray(np.stack(all_groups_vals)),
        group_tile=jnp.asarray(group_tile, jnp.int32),
        slab_win=jnp.asarray(all_groups_win, jnp.int32),
        tile_nonempty=jnp.asarray(tile_nonempty),
        shape=(rows, cols),
        n_tiles=n_tiles,
        n_win=n_win,
        group=group,
        nnz=csr.nnz,
    )


def _rowpure_kernel(tile_ref, win_ref, sidx_ref, vals_ref, x_ref, o_ref, *,
                    group: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    acc = jnp.zeros((8, 1), jnp.float32)
    for b in range(group):
        w = win_ref[g, b]
        xw = x_ref[pl.ds(w * 8, 8), :]
        gth = jnp.take_along_axis(xw, sidx_ref[0, b], axis=0)
        contrib = vals_ref[0, b] * gth
        acc = acc + jnp.sum(contrib, axis=1, keepdims=True)
    o_ref[:] = o_ref[:] + jnp.where(lane == 0, acc, 0.0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "interpret"))
def _rowpure_call(group_tile, slab_win, s_idx, vals, xp, *, group, n_tiles,
                  interpret=False):
    n_groups = s_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group, 8, _LANES), lambda g, t, w: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, 8, _LANES), lambda g, t, w: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda g, t, w: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_rowpure_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), vals.dtype),
        interpret=interpret,
    )(group_tile, slab_win, s_idx, vals, xp)


def spmv_sell_rowpure(packed: SellRowPure, x):
    """``y = A @ x`` via the row-pure slab layout."""
    rows, cols = packed.shape
    S = packed.n_win * 8
    xp = jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x).reshape(S, _LANES)
    out = _rowpure_call(
        packed.group_tile, packed.slab_win, packed.s_idx, packed.vals, xp,
        group=packed.group, n_tiles=packed.n_tiles,
        interpret=config.interpret(),
    )
    out = out.reshape(packed.n_tiles, 8, _LANES)[:, :, 0]
    out = jnp.where(packed.tile_nonempty[:, None], out, 0)
    return out.reshape(packed.n_tiles * 8)[:rows]


PALLAS_IMPLS: dict = {}
