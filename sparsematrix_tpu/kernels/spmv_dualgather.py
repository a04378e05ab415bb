"""Dual-gather SpMV — the round-3 fill-barrier break.

The row-lane layout (``spmv_rowlane.py``) pins a slot's sublane to its
column chunk (``u = (c % 1024) // 128``), so per-(row, chunk) bucket depth
sets slab count and fill is bounded by mean/max of Poisson buckets (~0.24
for uniform random — the "tail theorem", DESIGN.md).  This layout spends
one extra legal (8, 128) gather to buy that degree of freedom back:

  * slab = (8, 128) over a 1024-column window w of a 128-row tile t, with
    THREE planes: ``vals``, ``idxB`` (per target slot: its column's lane
    ``cl = c % 128``), and ``idxA`` (per (sublane, lane): which of the
    window's 8 chunks provides that x lane).
  * kernel inner step (both gathers are the legal (8, 128) forms —
    probe-verified on Mosaic, benchmarks/probe_dualgather.py):

        t1[u, cl] = xw[idxA[u, cl], cl]        # axis=0: chunk select
        out[u, l] = t1[u, idxB[u, l]]          # axis=1: lane route
        acc      += vals * out                 # lane l is the row slot
        y[tile]  += sum(acc, axis=0)           # one sublane sum, as before

  * an entry (r, c) can therefore sit at ANY (sublane u, lane l = r % 128)
    slot of any of its (t, w)'s slabs, subject only to
      (C1) one entry per (slab, u, row), and
      (C2) within (slab, u): equal ``cl`` implies equal chunk
           (two entries may share (u, cl) iff they are the same COLUMN —
           then they are different rows at different lanes, both reading
           t1[u, cl]).

Packing is bipartite edge coloring (rows x column-lanes, 8 colors per
slab); König's theorem guarantees a slab count of ceil(maxdegree / 8), so
fill is bounded by mean/max of per-(t, w) ROW degrees — Poisson(16) at the
XL shape, giving ~0.67 structural fill vs row-lane's 0.24.  Bytes drop
from ~21 B/nnz to ~9 B/nnz fp32 (6 B/slot: 4 vals + 2 index planes).

The packer here is a vectorized occurrence-seeded iterative repair
(numpy): seed (slab, sublane) from the row-occurrence index, then
repeatedly demote conflict losers (same (s, u, lane) or same (s, u, cl)
with a different chunk) to the next sublane/slab.  It lands near the
König bound without per-entry Python loops, so XL packs stay fast.

Padding invariant (framework-wide): zero values with in-range indices —
a padded slot contributes ``0 * x[something]`` and every padded (u, cl)
cell of idxA points at chunk 0, so no masking is ever needed.

No structural counterpart in the reference (its SpMV hot loop is the AXPY
scalar stream, /root/reference/src/sparse/kernel.cc:771-800); this is the
TPU-native formulation of the same memory-bound capability.
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

__all__ = ["DualGather", "pack_dualgather", "spmv_dualgather"]

_W = 1024
_LANES = 128
_T = 128  # rows per tile (lane = row slot, no lane sharing)


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class DualGather:
    idxA: jnp.ndarray  # (n_groups, group*8, 128) int8: chunk per (u, cl)
    idxB: jnp.ndarray  # (n_groups, group*8, 128) int8: cl per (u, l)
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_groups, group) int32
    t_pack: Optional["DualGather"]  # packed A^T for the VJP fast path
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        return self.nnz / max(self.vals.size, 1)


def _assign_slots(r, c, rows, cols, max_rounds=2000):
    """Vectorized conflict-repair assignment (active-set formulation).

    Returns (t, w, s, u, l, cl, ch) numpy arrays, one per entry, satisfying
    C1/C2 above.  Strategy: seed s/u from each entry's occurrence rank
    within its (t, w, row) group (so seeding never violates C1), then
    iterate on the ACTIVE (unsettled) set only: an active entry settles
    when its (t,w,s,u,l) row slot is free and its (t,w,s,u,cl) chunk cell
    is free or already carries its chunk; losers advance to the next
    sublane, and after all 8 sublanes of a slab, to the next slab.
    Settled entries never move (their occupancy lives in sorted key
    arrays queried by searchsorted), so convergence is monotone and each
    round costs O(active · log n) — XL packs stay seconds, not minutes.
    """
    t = r // _T
    l = r % _T
    w = c // _W
    cl = c % _LANES
    ch = (c % _W) // _LANES
    n = r.size
    n_win = max(-(-cols // _W), 1)

    # occurrence rank within (t, w, row)
    key_row = (t * n_win + w) * np.int64(_T) + l
    order = np.argsort(key_row, kind="stable")
    ko = key_row[order]
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = ko[1:] != ko[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    d = np.empty(n, np.int64)
    d[order] = np.arange(n) - run_start

    s = d // 8
    u = d % 8
    tries = np.zeros(n, np.int8)  # sublanes tried at current slab level
    twk = (t.astype(np.int64) * n_win + w)

    # settled occupancy: sorted row-slot keys; sorted chunk-cell keys with
    # their winning chunk (same-key same-ch entries share a cell freely)
    occ_row = np.empty(0, np.int64)
    occ_cell = np.empty(0, np.int64)
    occ_cell_ch = np.empty(0, np.int8)
    active = np.arange(n)
    # key spans are fixed up-front so settled keys stay comparable across
    # rounds (s can only grow; give it generous headroom)
    s_span = np.int64(max(int(s.max()) + 64, 256) * 16)

    def _k(idx):
        base = (twk[idx] * s_span + s[idx]) * 8 + u[idx]
        return base * _T + l[idx], base * _LANES + cl[idx]

    for _ in range(max_rounds):
        if active.size == 0:
            break
        k1a, k2a = _k(active)
        cha = ch[active].astype(np.int8)
        # conflicts with settled occupancy
        p1 = np.searchsorted(occ_row, k1a)
        bad = (p1 < occ_row.size) & (occ_row[p1 % max(occ_row.size, 1)]
                                     == k1a) if occ_row.size else \
            np.zeros(active.size, bool)
        p2 = np.searchsorted(occ_cell, k2a)
        if occ_cell.size:
            hit = (p2 < occ_cell.size) & (
                occ_cell[np.minimum(p2, occ_cell.size - 1)] == k2a)
            bad |= hit & (occ_cell_ch[np.minimum(p2, occ_cell.size - 1)]
                          != cha)
        # conflicts among the active set itself: first of each (k1) group
        # wins; within a (k2) group the first DISTINCT ch wins
        o1 = np.argsort(k1a, kind="stable")
        k1o = k1a[o1]
        f1 = np.empty(active.size, bool)
        f1[0] = True
        f1[1:] = k1o[1:] != k1o[:-1]
        b1 = np.zeros(active.size, bool)
        b1[o1] = ~f1
        bad |= b1
        o2 = np.lexsort((cha, k2a))
        k2o = k2a[o2]
        f2 = np.empty(active.size, bool)
        f2[0] = True
        f2[1:] = k2o[1:] != k2o[:-1]
        grp_start = np.maximum.accumulate(
            np.where(f2, np.arange(active.size), 0))
        b2 = np.zeros(active.size, bool)
        b2[o2] = cha[o2] != cha[o2][grp_start]
        bad |= b2

        # settle the winners: fold their keys into the occupancy arrays
        # (sorted inserts: O(existing + new), not a re-sort per round)
        win = active[~bad]
        if win.size:
            wk1, wk2 = _k(win)
            wk1.sort()
            occ_row = np.insert(occ_row, np.searchsorted(occ_row, wk1), wk1)
            ord2 = np.argsort(wk2, kind="stable")
            wk2s = wk2[ord2]
            wch = ch[win][ord2].astype(np.int8)
            # dedupe new cells (several same-column entries share one)
            keep = np.empty(wk2s.size, bool)
            keep[0] = True
            keep[1:] = wk2s[1:] != wk2s[:-1]
            wk2s, wch = wk2s[keep], wch[keep]
            pos = np.searchsorted(occ_cell, wk2s)
            occ_cell = np.insert(occ_cell, pos, wk2s)
            occ_cell_ch = np.insert(occ_cell_ch, pos, wch)

        active = active[bad]
        if active.size:
            u[active] = (u[active] + 1) % 8
            tries[active] += 1
            promote = active[tries[active] >= 8]
            s[promote] += 1
            tries[promote] = 0
            if s.max() * 16 >= s_span:  # headroom exceeded: rebase spans
                s_span = np.int64(int(s.max()) * 64)
                # settled keys were computed with the old span — recompute
                settled_mask = np.ones(n, bool)
                settled_mask[active] = False
                sk1, sk2 = _k(np.nonzero(settled_mask)[0])
                occ_row = np.sort(sk1)
                so = np.argsort(sk2, kind="stable")
                occ_cell = sk2[so]
                occ_cell_ch = ch[np.nonzero(settled_mask)[0]][so].astype(
                    np.int8)
                keep = np.empty(occ_cell.size, bool)
                if occ_cell.size:
                    keep[0] = True
                    keep[1:] = occ_cell[1:] != occ_cell[:-1]
                    occ_cell = occ_cell[keep]
                    occ_cell_ch = occ_cell_ch[keep]
    else:
        raise RuntimeError("dualgather packer failed to converge")
    return t, w, s, u, l, cl, ch


def _pack_arrays(r, c, v, rows, cols, group, dtype):
    n_tiles = -(-rows // _T)
    n_win = max(-(-cols // _W), 1)
    if r.size == 0:
        group = group or 8
        return dict(
            idxA=np.zeros((1, group * 8, _LANES), np.int8),
            idxB=np.zeros((1, group * 8, _LANES), np.int8),
            vals=np.zeros((1, group * 8, _LANES), dtype),
            group_tile=np.zeros((1,), np.int64),
            slab_win=np.zeros((1, group), np.int64),
            n_tiles=n_tiles, n_win=n_win, group=group,
        )
    t, w, s, u, l, cl, ch = _assign_slots(r, c, rows, cols)

    # slab identity (t, w, s) → contiguous slots, t-major (same scheme as
    # the rowlane packer so the grid revisits each output tile once)
    d_span = int(s.max()) + 1
    skey = (t.astype(np.int64) * n_win + w) * d_span + s
    uskey, inv = np.unique(skey, return_inverse=True)
    slab_t = uskey // (n_win * d_span)
    slab_w = (uskey // d_span) % n_win
    n_slabs = len(uskey)
    counts = np.bincount(slab_t, minlength=n_tiles)
    if group is None:
        group = 1
        for g in (256, 128, 64, 32, 16, 8, 4, 2):
            waste = ((-(-counts // g) * g).sum() - n_slabs) / max(n_slabs, 1)
            if waste <= 0.15:
                group = g
                break
    tile_groups = -(-counts // group)
    padded = tile_groups * group
    tile_offset = np.concatenate([[0], np.cumsum(padded)])
    first_of_tile = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(n_slabs) - first_of_tile[slab_t]
    slab_slot = tile_offset[slab_t] + rank
    total_slots = int(tile_offset[-1])
    n_groups = total_slots // group

    idxA = np.zeros((total_slots, 8, _LANES), np.int8)
    idxB = np.zeros((total_slots, 8, _LANES), np.int8)
    vals = np.zeros((total_slots, 8, _LANES), dtype)
    win = np.zeros(total_slots, np.int64)
    entry_slot = slab_slot[inv]
    idxB[entry_slot, u, l] = cl
    idxA[entry_slot, u, cl] = ch
    vals[entry_slot, u, l] = v
    win[slab_slot] = slab_w
    group_tile = np.repeat(np.arange(n_tiles), tile_groups)
    return dict(
        idxA=idxA.reshape(n_groups, group * 8, _LANES),
        idxB=idxB.reshape(n_groups, group * 8, _LANES),
        vals=vals.reshape(n_groups, group * 8, _LANES),
        group_tile=group_tile,
        slab_win=win.reshape(n_groups, group),
        n_tiles=n_tiles, n_win=n_win, group=group,
    )


def pack_dualgather(csr: CSR, group: int | None = None,
                    with_transpose: bool = False,
                    dtype=None) -> DualGather:
    """Pack CSR into dual-gather slabs.

    ``group``: slabs per grid step (None → auto by the ≤15 % padding-waste
    rule, largest of 256..2).  ``with_transpose`` also packs A^T so the
    custom VJP's backward pass runs on the fast kernel.  ``dtype=bfloat16``
    stores values in bf16 (accumulation stays fp32).
    """
    sp = csr.to_scipy().tocoo()
    rows, cols = sp.shape
    r = sp.row.astype(np.int64)
    c = sp.col.astype(np.int64)
    v = sp.data
    arrs = _pack_arrays(r, c, v, rows, cols, group, v.dtype)
    t_pack = None
    if with_transpose:
        t_pack = pack_dualgather(
            CSR.from_scipy(csr.to_scipy().T.tocsr()), group=group,
            with_transpose=False, dtype=dtype,
        )
    vals_np = arrs["vals"]
    return DualGather(
        idxA=jnp.asarray(arrs["idxA"], jnp.int8),
        idxB=jnp.asarray(arrs["idxB"], jnp.int8),
        vals=(jnp.asarray(vals_np) if dtype is None
              else jnp.asarray(vals_np).astype(dtype)),
        group_tile=jnp.asarray(arrs["group_tile"], jnp.int32),
        slab_win=jnp.asarray(arrs["slab_win"], jnp.int32),
        t_pack=t_pack,
        shape=(rows, cols),
        n_tiles=arrs["n_tiles"],
        n_win=arrs["n_win"],
        group=arrs["group"],
        nnz=csr.nnz,
    )


def _dualgather_kernel(tile_ref, win_ref, idxA_ref, idxB_ref, vals_ref,
                       x_ref, o_ref, *, group: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        iA = idxA_ref[0, b * 8:(b + 1) * 8, :]
        iB = idxB_ref[0, b * 8:(b + 1) * 8, :]
        t1 = jnp.take_along_axis(xw, iA, axis=0)   # chunk select (legal)
        gth = jnp.take_along_axis(t1, iB, axis=1)  # lane route (legal)
        acc = acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth
    part = jnp.sum(acc, axis=0, keepdims=True)
    o_ref[0:1, :] = o_ref[0:1, :] + part.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "interpret"))
def _dualgather_call(group_tile, slab_win, idxA, idxB, vals, xp, *, group,
                     n_tiles, interpret=False):
    n_groups = idxA.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x (S,128)
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda g, t, w: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_dualgather_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, slab_win.reshape(-1), idxA, idxB, vals, xp)


# scalar-prefetch SMEM budget — same chunking rule as the rowlane kernel
_SMEM_PREFETCH_BUDGET = 800_000  # bytes


def _max_groups_per_call(group: int) -> int:
    return max(1, _SMEM_PREFETCH_BUDGET // (4 * (group + 1)))


def _dualgather_forward(packed: DualGather, x):
    rows, cols = packed.shape
    S = packed.n_win * 8
    xp = jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x).reshape(S, _LANES)
    n_groups = packed.idxA.shape[0]
    y = jnp.zeros((packed.n_tiles, _T), jnp.float32)
    chunk = _max_groups_per_call(packed.group)
    for g0 in range(0, n_groups, chunk):
        g1 = min(g0 + chunk, n_groups)
        out = _dualgather_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.idxA[g0:g1], packed.idxB[g0:g1], packed.vals[g0:g1], xp,
            group=packed.group, n_tiles=packed.n_tiles,
            interpret=config.interpret(),
        )
        out = out.reshape(packed.n_tiles, 8, _LANES)[:, 0, :]
        touched = (
            jnp.zeros(packed.n_tiles, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        y = y + jnp.where(touched[:, None], out, 0)
    return y.reshape(packed.n_tiles * _T)[:rows]


def _slot_row_col(packed: DualGather):
    """Per-slot (row, col) reconstruction for the jnp fallback paths.

    cl comes from idxB at the slot; its chunk from idxA at (u, cl)."""
    n_groups, GH, _ = packed.idxB.shape
    group = packed.group
    iB4 = packed.idxB.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    iA4 = packed.idxA.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    ch = jnp.take_along_axis(iA4, iB4, axis=3)  # (n_groups, group, 8, 128)
    win = packed.slab_win[:, :, None, None]
    col = win * _W + ch * _LANES + iB4
    lane = jnp.arange(_LANES)[None, None, None, :]
    row = packed.group_tile[:, None, None, None] * _T + lane
    return (jnp.broadcast_to(row, col.shape).reshape(n_groups, GH, _LANES),
            col.reshape(n_groups, GH, _LANES))


def _dualgather_matvec_t_jnp(packed: DualGather, g):
    """``A^T @ g`` from the slab arrays alone (XLA scatter fallback for the
    VJP when no transposed pack was built — correct, not fast)."""
    row, col = _slot_row_col(packed)
    gv = g[row] * packed.vals
    cols = packed.shape[1]
    out = jnp.zeros((cols,), packed.vals.dtype)
    return out.at[col.reshape(-1)].add(gv.reshape(-1))


@jax.custom_vjp
def spmv_dualgather(packed: DualGather, x):
    """``y = A @ x`` via the dual-gather slab layout (differentiable in x)."""
    return _dualgather_forward(packed, x)


def _dg_fwd(packed, x):
    return _dualgather_forward(packed, x), (packed, x)


def _dg_bwd(res, g):
    packed, x = res
    if packed.t_pack is not None:
        gx = _dualgather_forward(packed.t_pack, g)
    else:
        gx = _dualgather_matvec_t_jnp(packed, g)
    row, col = _slot_row_col(packed)
    rows, cols = packed.shape
    xpad = jnp.zeros((packed.n_win * _W,), x.dtype).at[:cols].set(x)
    gpad = jnp.zeros((packed.n_tiles * _T,), g.dtype).at[:rows].set(g)
    mask = packed.vals != 0  # padding slots carry no gradient
    dvals = jnp.where(mask, xpad[col] * gpad[row], 0).astype(
        packed.vals.dtype)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(dpacked, vals=dvals)
    return dpacked, gx


spmv_dualgather.defvjp(_dg_fwd, _dg_bwd)
