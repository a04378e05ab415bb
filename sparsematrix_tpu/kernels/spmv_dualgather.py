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

__all__ = ["DualGather", "PooledDG", "pack_dualgather", "spmv_dualgather"]

_W = 1024
_LANES = 128
_T = 128  # rows per tile (lane = row slot, no lane sharing)


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class PooledDG:
    """Cross-window "pooled" slabs: each SUBLANE carries its own global
    chunk pointer (8 arbitrary (1,128) x slices — probe-verified,
    benchmarks/probe_sublane_slice.py), so deep-row tail entries from
    different windows share slabs.  Same dual-gather planes otherwise;
    idxA selects among the slab's 8 loaded chunks."""

    ptr: jnp.ndarray  # (n_groups, group, 8) int32: global chunk per sublane
    idxA: jnp.ndarray  # (n_groups, group*8, 128) int8: loaded-slot per (u, cl)
    idxB: jnp.ndarray  # (n_groups, group*8, 128) int8: cl per (u, l)
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class DualGather:
    idxA: jnp.ndarray  # (n_groups, group*8, 128) int8: chunk per (u, cl)
    idxB: jnp.ndarray  # (n_groups, group*8, 128) int8: cl per (u, l)
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — tile (k_tiles=1) or
    #                          SUPERBLOCK id (k_tiles>1), sorted ascending
    slab_win: jnp.ndarray  # (n_groups, group) int32
    slab_tloc: Optional[jnp.ndarray]  # (n_groups, group) int32: tile
    #                          within superblock (k_tiles>1 only)
    commit: Optional[jnp.ndarray]  # (n_groups,) int32: last group of its
    #                          superblock (k_tiles>1 only)
    tail: Optional[PooledDG]  # pooled spill slabs (spill_cap packs)
    t_pack: Optional["DualGather"]  # packed A^T for the VJP fast path
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    k_tiles: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})
    # superblock-aligned call-chunk boundaries (k_tiles>1 with more groups
    # than one call's SMEM prefetch budget); () = single call
    splits: Tuple[int, ...] = dataclasses.field(
        default=(), metadata={"static": True})
    # idxA nibble-packed two slabs per byte (superblock path only):
    # chunk ids are 0-7 = 3 bits, so slab pair (2b, 2b+1) shares one
    # (8,128) int8 plane (lo/hi nibble) — halves the idxA stream
    nibble: bool = dataclasses.field(
        default=False, metadata={"static": True})
    # two-window slabs: slab_win packs (wa | wb<<16) and idxA's 4th bit
    # selects the window per (sublane, lane) cell — fill bound becomes
    # mean/max of PAIRED window row degrees (0.507 → 0.663 at XL)
    two_win: bool = dataclasses.field(
        default=False, metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        slots = self.vals.size + (self.tail.vals.size if self.tail else 0)
        return self.nnz / max(slots, 1)


def _spill_mask(r, c, rows, cols, cap):
    """True for entries whose occurrence rank within (tile, window, row)
    is >= cap — the deep-row tail that window-scoped slabs cannot pack
    (slab count per (t, w) >= ceil(max row degree / 8))."""
    t = r // _T
    l = r % _T
    w = c // _W
    n_win = max(-(-cols // _W), 1)
    key = (t * n_win + w) * np.int64(_T) + l
    order = np.argsort(key, kind="stable")
    ko = key[order]
    n = r.size
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = ko[1:] != ko[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
    d = np.empty(n, np.int64)
    d[order] = np.arange(n) - run_start
    return d >= cap


def _pack_pooled(r, c, v, rows, cols, group, dtype):
    """Greedy pooled-slab packer for the spill tail (per tile: pick the 8
    chunks with most remaining entries, fill one slab, repeat).  Fill is
    bounded by per-(tile, chunk) tail thinness, not by window row
    degrees."""
    n_tiles = -(-rows // _T)
    n_win = max(-(-cols // _W), 1)
    t = (r // _T).astype(np.int64)
    l = (r % _T).astype(np.int64)
    chunk = (c // _LANES).astype(np.int64)
    cl = (c % _LANES).astype(np.int64)

    slab_tile, slab_ptr = [], []
    planes_iA, planes_iB, planes_v = [], [], []
    order = np.argsort(t, kind="stable")
    bounds = np.searchsorted(t[order], np.arange(n_tiles + 1))
    for ti in range(n_tiles):
        sel = order[bounds[ti]:bounds[ti + 1]]
        if sel.size == 0:
            continue
        by_chunk: dict = {}
        for e in sel:
            by_chunk.setdefault(int(chunk[e]), []).append(e)
        while by_chunk:
            top = sorted(by_chunk, key=lambda k: -len(by_chunk[k]))[:8]
            ptr = (top + [top[0]] * (8 - len(top)))
            iA = np.zeros((8, _LANES), np.int8)
            iB = np.zeros((8, _LANES), np.int8)
            vv = np.zeros((8, _LANES), dtype)
            rowused = np.zeros((8, _T), bool)
            cellslot = np.full((8, _LANES), -1, np.int8)
            for k, ck in enumerate(top):
                left = []
                for e in by_chunk[ck]:
                    le, cle = int(l[e]), int(cl[e])
                    placed = False
                    for u in range((le + cle) % 8, (le + cle) % 8 + 8):
                        u &= 7
                        if rowused[u, le]:
                            continue
                        cs = cellslot[u, cle]
                        if cs == -1 or cs == k:
                            rowused[u, le] = True
                            cellslot[u, cle] = k
                            iA[u, cle] = k
                            iB[u, le] = cle
                            vv[u, le] = v[e]
                            placed = True
                            break
                    if not placed:
                        left.append(e)
                if left:
                    by_chunk[ck] = left
                else:
                    del by_chunk[ck]
            slab_tile.append(ti)
            slab_ptr.append(ptr)
            planes_iA.append(iA)
            planes_iB.append(iB)
            planes_v.append(vv)

    n_slabs = max(len(slab_tile), 1)
    if not slab_tile:
        slab_tile = [0]
        slab_ptr = [[0] * 8]
        planes_iA = [np.zeros((8, _LANES), np.int8)]
        planes_iB = [np.zeros((8, _LANES), np.int8)]
        planes_v = [np.zeros((8, _LANES), dtype)]
    stile = np.asarray(slab_tile, np.int64)
    counts = np.bincount(stile, minlength=n_tiles)
    if group is None:
        group = 1
        for g in (32, 16, 8, 4, 2):
            waste = ((-(-counts // g) * g).sum() - n_slabs) / max(n_slabs, 1)
            if waste <= 0.15:
                group = g
                break
    tile_groups = -(-counts // group)
    padded = tile_groups * group
    tile_offset = np.concatenate([[0], np.cumsum(padded)])
    first_of_tile = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(n_slabs) - first_of_tile[stile]
    slot = tile_offset[stile] + rank
    total = int(tile_offset[-1])
    n_groups = total // group
    iA = np.zeros((total, 8, _LANES), np.int8)
    iB = np.zeros((total, 8, _LANES), np.int8)
    vv = np.zeros((total, 8, _LANES), dtype)
    pt = np.zeros((total, 8), np.int64)
    iA[slot] = np.stack(planes_iA)
    iB[slot] = np.stack(planes_iB)
    vv[slot] = np.stack(planes_v)
    pt[slot] = np.asarray(slab_ptr, np.int64)
    group_tile = np.repeat(np.arange(n_tiles), tile_groups)
    return dict(
        ptr=pt.reshape(n_groups, group, 8),
        idxA=iA.reshape(n_groups, group * 8, _LANES),
        idxB=iB.reshape(n_groups, group * 8, _LANES),
        vals=vv.reshape(n_groups, group * 8, _LANES),
        group_tile=group_tile,
        n_tiles=n_tiles, n_win=n_win, group=group,
    )


def _pair_windows(deg):
    """Per-tile greedy matching of windows into pairs minimizing the joint
    slab count ceil(max_row(deg_a + deg_b) / 8).

    deg: (n_tiles, n_win, _T) per-(tile, window, row-lane) degree counts.
    Returns pairs (n_tiles, n_pairs, 2) — odd window counts pair the last
    window with itself (harmless: the side bit just never selects b).
    Matching highest-max windows first against their cheapest complement
    recovers most of the gain of optimal matching (measured on the XL
    shape: 0.663 matched vs 0.639 adjacent vs 0.507 single-window fill).
    """
    n_tiles, n_win, _ = deg.shape
    n_pairs = (n_win + 1) // 2
    pairs = np.zeros((n_tiles, n_pairs, 2), np.int64)
    for ti in range(n_tiles):
        d = deg[ti]
        order = np.argsort(-d.max(axis=1))
        used = np.zeros(n_win, bool)
        out = []
        for wi in order:
            if used[wi]:
                continue
            used[wi] = True
            cand = np.nonzero(~used)[0]
            if cand.size == 0:
                out.append((wi, wi))
                continue
            joint = d[wi][None, :] + d[cand]
            cost = -(-joint.max(axis=1) // 8)
            best = cand[int(np.argmin(cost))]
            used[best] = True
            out.append((wi, best))
        pairs[ti] = np.asarray(out)
    return pairs


def _two_win_ids(r, c, rows, cols):
    """Per-entry (pair-id, synthetic-chunk) for the two-window layout:
    slabs carry TWO window pointers and idxA grows a 4th bit selecting
    between them per (sublane, lane) cell — so the fill bound becomes
    mean/max of the PAIRED row degrees (λ doubles, max/mean tightens).

    Returns (w_ids, ch_ids, pairtab): w_ids = tile-local pair index,
    ch_ids = chunk 0-7 + 8·side, pairtab (n_tiles, n_pairs, 2) windows.
    """
    t = r // _T
    l = r % _T
    w = c // _W
    n_tiles = max(-(-rows // _T), 1)
    n_win = max(-(-cols // _W), 1)
    deg = np.zeros((n_tiles, n_win, _T), np.int32)
    np.add.at(deg, (t, w, l), 1)
    pairtab = _pair_windows(deg)
    pid_of = np.zeros((n_tiles, n_win), np.int64)
    side_of = np.zeros((n_tiles, n_win), np.int64)
    ar = np.arange(pairtab.shape[1])
    for ti in range(n_tiles):
        pid_of[ti, pairtab[ti, :, 0]] = ar
        side_of[ti, pairtab[ti, :, 0]] = 0
        pid_of[ti, pairtab[ti, :, 1]] = ar
        side_of[ti, pairtab[ti, :, 1]] = 1
        # self-paired windows keep side 0
        selfp = pairtab[ti, :, 0] == pairtab[ti, :, 1]
        side_of[ti, pairtab[ti, selfp, 0]] = 0
    w_ids = pid_of[t, w]
    ch_ids = (c % _W) // _LANES + 8 * side_of[t, w]
    return w_ids, ch_ids, pairtab


def _assign_slots_native(r, c, rows, cols, w_ids=None, ch_ids=None):
    """Native sequential first-fit assignment (native/codec.cc:
    smtpu_assign_dualgather) — ~100× the numpy repair at the XL pack
    with equal-or-better fill.  Returns the assigned tuple or None when
    the native library is unavailable."""
    from ..native import get_lib

    lib = get_lib()
    if lib is None or r.size == 0:
        return None
    import ctypes

    t = (r // _T).astype(np.int64)
    l = (r % _T).astype(np.int32)
    w = (c // _W if w_ids is None else w_ids).astype(np.int64)
    cl = (c % _LANES).astype(np.int32)
    ch = ((c % _W) // _LANES if ch_ids is None else ch_ids).astype(np.int32)
    n_win = max(-(-cols // _W), 1)
    cellid = np.ascontiguousarray(t * n_win + w)
    n_cells = int(cellid.max()) + 1
    out_s = np.empty(r.size, np.int32)
    out_u = np.empty(r.size, np.int8)
    l_c = np.ascontiguousarray(l)
    cl_c = np.ascontiguousarray(cl)
    ch_c = np.ascontiguousarray(ch)
    rc = lib.smtpu_assign_dualgather(
        cellid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        l_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cl_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ch_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        r.size, n_cells,
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_u.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc < 0:
        return None
    return (t, w, out_s.astype(np.int64), out_u.astype(np.int64),
            l.astype(np.int64), cl.astype(np.int64), ch.astype(np.int64))


def _assign_slots(r, c, rows, cols, max_rounds=2000, w_ids=None,
                  ch_ids=None):
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

    ``w_ids``/``ch_ids`` override the default window/chunk coordinates
    (two-window layout: pair index + 4-bit synthetic chunk).

    The native first-fit (``_assign_slots_native``) is tried first; this
    numpy machine is the fallback.
    """
    native = _assign_slots_native(r, c, rows, cols, w_ids=w_ids,
                                  ch_ids=ch_ids)
    if native is not None:
        return native
    t = r // _T
    l = r % _T
    w = c // _W if w_ids is None else w_ids
    cl = c % _LANES
    ch = (c % _W) // _LANES if ch_ids is None else ch_ids
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

    def _sweep(active):
        nonlocal occ_row, occ_cell, occ_cell_ch, s_span
        stall = 0
        prev_size = -1
        for _ in range(max_rounds):
            if active.size == 0:
                return
            if active.size == prev_size:
                stall += 1
            else:
                stall, prev_size = 0, active.size
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
            # conflicts among the active set itself: first of each (k1)
            # group wins; within a (k2) group the first DISTINCT ch wins
            o1 = np.argsort(k1a, kind="stable")
            k1o = k1a[o1]
            f1 = np.empty(active.size, bool)
            f1[0] = True
            f1[1:] = k1o[1:] != k1o[:-1]
            b1 = np.zeros(active.size, bool)
            b1[o1] = ~f1
            bad |= b1
            # winner of a (k2) cell group: smallest ch first (slightly
            # better fill), EXCEPT after a stall — inconsistent winner
            # orders between the k1 (first-by-index) and k2 rules can
            # deadlock a same-(row,cl) pair into lockstep (both bad every
            # round, advancing together forever); the index rule makes
            # every conflict group's first-by-index entry unkillable by
            # self-conflicts, guaranteeing progress
            if stall >= 50:
                o2 = np.argsort(k2a, kind="stable")
            else:
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

            # settle the winners: fold their keys into the occupancy
            # arrays (sorted inserts, not a re-sort per round)
            win = active[~bad]
            if win.size:
                wk1, wk2 = _k(win)
                wk1.sort()
                occ_row = np.insert(occ_row, np.searchsorted(occ_row, wk1),
                                    wk1)
                ord2 = np.argsort(wk2, kind="stable")
                wk2s = wk2[ord2]
                wch = ch[win][ord2].astype(np.int8)
                # dedupe new cells (same-column entries share one)
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
                if s.max() * 16 >= s_span:  # headroom exceeded: rebase
                    s_span = np.int64(int(s.max()) * 64)
                    # settled keys used the old span — recompute
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
        raise RuntimeError("dualgather packer failed to converge")

    _sweep(active)

    # compaction: the forward-only search overshoots the Koenig bound by
    # one slab in ~60 % of cells (a promoted entry never retries LOWER s
    # once others settle).  Re-sweep every entry parked at s >= its
    # cell's bound from s=0 against the final occupancy — monotone: an
    # entry at worst re-reaches its old, now-freed slot.  (Measured at
    # the XL two-win point: 27027 -> ~25k slabs, fill 0.602 -> ~0.65.)
    def _n_slabs():
        kk = twk * np.int64(s.max() + 1) + s
        return np.unique(kk).size

    for _compact in range(2):
        deg = np.zeros((twk.max() + 1, _T), np.int32)
        np.add.at(deg, (twk, l), 1)
        bound_cell = -(-deg.max(axis=1) // 8)
        excess = np.nonzero(s >= bound_cell[twk])[0]
        if excess.size == 0:
            break
        before = _n_slabs()
        save_s, save_u = s.copy(), u.copy()
        keep_mask = np.ones(n, bool)
        keep_mask[excess] = False
        kept = np.nonzero(keep_mask)[0]
        kk1, kk2 = _k(kept)
        occ_row = np.sort(kk1)
        so = np.argsort(kk2, kind="stable")
        occ_cell = kk2[so]
        occ_cell_ch = ch[kept][so].astype(np.int8)
        if occ_cell.size:
            keep = np.empty(occ_cell.size, bool)
            keep[0] = True
            keep[1:] = occ_cell[1:] != occ_cell[:-1]
            occ_cell = occ_cell[keep]
            occ_cell_ch = occ_cell_ch[keep]
        # reseed by occurrence rank within (cell, row): same-row resets
        # get DISTINCT (s, u) so the sweep never livelocks in lockstep
        keyx = twk[excess] * np.int64(_T) + l[excess]
        ox = np.argsort(keyx, kind="stable")
        kxo = keyx[ox]
        newx = np.empty(excess.size, bool)
        newx[0] = True
        newx[1:] = kxo[1:] != kxo[:-1]
        rsx = np.maximum.accumulate(np.where(newx, np.arange(excess.size),
                                             0))
        dx = np.empty(excess.size, np.int64)
        dx[ox] = np.arange(excess.size) - rsx
        s[excess] = dx // 8
        u[excess] = (dx + l[excess] + cl[excess]) % 8
        tries[excess] = 0
        _sweep(excess.copy())
        if _n_slabs() >= before:  # not an improvement: keep the original
            s, u = save_s, save_u
            break
    return t, w, s, u, l, cl, ch


def _pack_arrays(r, c, v, rows, cols, group, dtype, k_tiles=1, assigned=None):
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
            slab_tloc=np.zeros((1, group), np.int64),
            commit=np.ones((1,), np.int64),
            n_tiles=n_tiles, n_win=n_win, group=group, k_tiles=k_tiles,
        )
    if assigned is None:
        assigned = _assign_slots(r, c, rows, cols)
    t, w, s, u, l, cl, ch = assigned

    # slab identity (t, w, s) → contiguous slots, t-major (same scheme as
    # the rowlane packer so the grid revisits each output block once);
    # with k_tiles > 1 the output block is a SUPERBLOCK of k_tiles tiles
    # and group padding quantizes at superblock granularity
    d_span = int(s.max()) + 1
    skey = (t.astype(np.int64) * n_win + w) * d_span + s
    uskey, inv = np.unique(skey, return_inverse=True)
    slab_t = uskey // (n_win * d_span)
    slab_w = (uskey // d_span) % n_win
    n_slabs = len(uskey)
    slab_sb = slab_t // k_tiles
    n_super = -(-n_tiles // k_tiles)
    counts = np.bincount(slab_sb, minlength=n_super)
    if group is None:
        group = 1
        for g in (256, 128, 64, 32, 16, 8, 4, 2):
            waste = ((-(-counts // g) * g).sum() - n_slabs) / max(n_slabs, 1)
            if waste <= 0.15:
                group = g
                break
    sb_groups = -(-counts // group)
    padded = sb_groups * group
    sb_offset = np.concatenate([[0], np.cumsum(padded)])
    first_of_sb = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(n_slabs) - first_of_sb[slab_sb]
    slab_slot = sb_offset[slab_sb] + rank
    total_slots = int(sb_offset[-1])
    n_groups = total_slots // group

    idxA = np.zeros((total_slots, 8, _LANES), np.int8)
    idxB = np.zeros((total_slots, 8, _LANES), np.int8)
    vals = np.zeros((total_slots, 8, _LANES), dtype)
    win = np.zeros(total_slots, np.int64)
    tloc = np.zeros(total_slots, np.int64)
    entry_slot = slab_slot[inv]
    idxB[entry_slot, u, l] = cl
    idxA[entry_slot, u, cl] = ch
    vals[entry_slot, u, l] = v
    win[slab_slot] = slab_w
    tloc[slab_slot] = slab_t % k_tiles
    group_tile = np.repeat(np.arange(n_super), sb_groups)
    pos = np.arange(len(group_tile)) - np.concatenate(
        [[0], np.cumsum(sb_groups)])[group_tile]
    commit = (pos == sb_groups[group_tile] - 1).astype(np.int64)
    return dict(
        idxA=idxA.reshape(n_groups, group * 8, _LANES),
        idxB=idxB.reshape(n_groups, group * 8, _LANES),
        vals=vals.reshape(n_groups, group * 8, _LANES),
        group_tile=group_tile,
        slab_win=win.reshape(n_groups, group),
        slab_tloc=tloc.reshape(n_groups, group),
        commit=commit,
        n_tiles=n_tiles, n_win=n_win, group=group, k_tiles=k_tiles,
    )


_ASSIGN_CACHE: dict = {}


def pack_dualgather(csr: CSR, group: int | None = None,
                    with_transpose: bool = False,
                    spill_cap: int | None = None,
                    k_tiles: int = 1,
                    dtype=None,
                    two_win: bool = False) -> DualGather:
    """Pack CSR into dual-gather slabs.

    ``group``: slabs per grid step (None → auto by the ≤15 % padding-waste
    rule, largest of 256..2).  ``with_transpose`` also packs A^T so the
    custom VJP's backward pass runs on the fast kernel.  ``dtype=bfloat16``
    stores values in bf16 (accumulation stays fp32).

    ``spill_cap``: cap entries per (tile, window, row) in the window-scoped
    body; the excess goes to cross-window POOLED slabs (per-sublane chunk
    pointers).  Window-scoped fill is hard-bounded by ceil(max row degree
    per window / 8); capping at ~mean+σ keeps the body slabs ~90 % full
    and pools the Poisson tail.  None = no cap (single-layer pack);
    "auto" = 8·ceil((mean_deg + sqrt(mean_deg)) / 8) when that beats the
    uncapped bound.

    ``two_win``: each slab carries TWO window pointers (matched per tile
    to minimize the joint slab count) and idxA's 4th bit selects between
    them per cell — the round-4 fill break (0.507 → 0.663 structural at
    the XL shape, i.e. ~8.3 B/nnz fp32 with nibble idxA).  Superblock
    path only (requires ``k_tiles > 1``); incompatible with spill_cap.
    """
    if two_win and k_tiles <= 1:
        raise ValueError("two_win requires the superblock path (k_tiles>1)")
    if two_win and spill_cap is not None:
        raise ValueError("two_win is incompatible with spill_cap")
    sp = csr.to_scipy().tocoo()
    rows, cols = sp.shape
    r = sp.row.astype(np.int64)
    c = sp.col.astype(np.int64)
    v = sp.data
    tail = None
    if spill_cap == "auto" and r.size:
        n_win = max(-(-cols // _W), 1)
        # mean entries per (row, window)
        mean_deg = r.size / max(-(-rows // _T) * _T * n_win, 1)
        # cap at ~the mean row-window degree rounded to slab capacity:
        # body slabs stay ~90 % full (E[min(X, mean)] ≈ mean − σ·φ-ish)
        # while the pooled tail stays ~10 % of nnz.  Below one slab of
        # mean degree the second kernel pass can't pay for itself.
        cap = 8 * max(1, int(round(mean_deg / 8)))
        spill_cap = cap if mean_deg >= 8 else None
    if spill_cap is not None and r.size:
        sm = _spill_mask(r, c, rows, cols, int(spill_cap))
        if sm.any():
            tr, tc, tv = r[sm], c[sm], v[sm]
            parrs = _pack_pooled(tr, tc, tv, rows, cols, None, v.dtype)
            tvals = jnp.asarray(parrs["vals"])
            if dtype is not None:
                tvals = tvals.astype(dtype)
            tail = PooledDG(
                ptr=jnp.asarray(parrs["ptr"], jnp.int32),
                idxA=jnp.asarray(parrs["idxA"], jnp.int8),
                idxB=jnp.asarray(parrs["idxB"], jnp.int8),
                vals=tvals,
                group_tile=jnp.asarray(parrs["group_tile"], jnp.int32),
                shape=(rows, cols),
                n_tiles=parrs["n_tiles"],
                n_win=parrs["n_win"],
                group=parrs["group"],
                nnz=int(sm.sum()),
            )
            r, c, v = r[~sm], c[~sm], v[~sm]
    assigned = None
    pairtab = None
    if two_win and r.size:
        w_ids, ch_ids, pairtab = _two_win_ids(r, c, rows, cols)
    if tail is None and r.size:
        # slot assignment is (r, c)-only and costs ~100 s at 16 M nnz;
        # cache it per CSR object so re-packs at other (group, k_tiles,
        # dtype) configurations are nearly free
        import weakref

        key = (id(csr), two_win)
        ent = _ASSIGN_CACHE.get(key)
        if ent is not None and ent[0]() is csr:
            assigned = ent[1]
        else:
            if two_win:
                assigned = _assign_slots(r, c, rows, cols, w_ids=w_ids,
                                         ch_ids=ch_ids)
            else:
                assigned = _assign_slots(r, c, rows, cols)
            ref = weakref.ref(csr,
                              lambda _u, k=key: _ASSIGN_CACHE.pop(k, None))
            _ASSIGN_CACHE[key] = (ref, assigned)
    arrs = _pack_arrays(r, c, v, rows, cols, group, v.dtype,
                        k_tiles=k_tiles, assigned=assigned)
    if two_win:
        # slab_win currently holds the tile-local PAIR index; repack it as
        # (wa | wb << 16) physical window pointers for the kernel
        gsup = np.asarray(arrs["group_tile"])[:, None]
        tile = np.minimum(gsup * k_tiles + np.asarray(arrs["slab_tloc"]),
                          arrs["n_tiles"] - 1)
        pid = np.asarray(arrs["slab_win"])
        if pairtab is None:  # empty matrix
            pairtab = np.zeros((arrs["n_tiles"], 1, 2), np.int64)
        pid = np.minimum(pid, pairtab.shape[1] - 1)
        wa = pairtab[tile, pid, 0]
        wb = pairtab[tile, pid, 1]
        arrs["slab_win"] = wa | (wb << 16)
    t_pack = None
    if with_transpose:
        t_pack = pack_dualgather(
            CSR.from_scipy(csr.to_scipy().T.tocsr()), group=group,
            spill_cap=spill_cap, k_tiles=k_tiles, with_transpose=False,
            dtype=dtype, two_win=two_win,
        )
    vals_np = arrs["vals"]
    idxA_np = np.asarray(arrs["idxA"], np.int8)
    nibble = k_tiles > 1 and arrs["group"] % 2 == 0 and idxA_np.size > 0
    if nibble:
        ngq = idxA_np.shape[0]
        ia4 = idxA_np.reshape(ngq, arrs["group"], 8, _LANES)
        idxA_np = (ia4[:, 0::2] | (ia4[:, 1::2] << 4)).reshape(
            ngq, (arrs["group"] // 2) * 8, _LANES).astype(np.int8)
    return DualGather(
        idxA=jnp.asarray(idxA_np, jnp.int8),
        idxB=jnp.asarray(arrs["idxB"], jnp.int8),
        vals=(jnp.asarray(vals_np) if dtype is None
              else jnp.asarray(vals_np).astype(dtype)),
        group_tile=jnp.asarray(arrs["group_tile"], jnp.int32),
        slab_win=jnp.asarray(arrs["slab_win"], jnp.int32),
        slab_tloc=(jnp.asarray(arrs["slab_tloc"], jnp.int32)
                   if k_tiles > 1 else None),
        commit=(jnp.asarray(arrs["commit"], jnp.int32)
                if k_tiles > 1 else None),
        tail=tail,
        t_pack=t_pack,
        shape=(rows, cols),
        n_tiles=arrs["n_tiles"],
        n_win=arrs["n_win"],
        group=arrs["group"],
        k_tiles=k_tiles,
        nnz=csr.nnz,
        splits=(tuple(_sb_splits(arrs["group_tile"], arrs["group"]))
                if k_tiles > 1 else ()),
        nibble=nibble,
        two_win=two_win,
    )


def _sb_splits(group_super, group):
    """Superblock-aligned call boundaries under the SMEM prefetch budget
    (an accumulator must never span two pallas calls)."""
    n_groups = len(group_super)
    budget = max(1, _SMEM_PREFETCH_BUDGET // (8 * group + 8))
    if n_groups <= budget:
        return []
    cuts = []
    pos = 0
    while n_groups - pos > budget:
        cut = pos + budget
        while cut > pos and group_super[cut] == group_super[cut - 1]:
            cut -= 1
        if cut == pos:  # one superblock larger than the budget
            raise ValueError("superblock exceeds the SMEM prefetch budget; "
                             "use a smaller group or k_tiles")
        cuts.append(int(cut))
        pos = cut
    return cuts


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


def _dualgather_sb_kernel(super_ref, win_ref, tloc_ref, commit_ref,
                          idxA_ref, idxB_ref, vals_ref, x_ref, o_ref,
                          acc_ref, *, group: int, k_tiles: int,
                          nibble: bool, two_win: bool,
                          acc_mode: str = "masked"):
    """Superblock variant: the output block spans k_tiles tiles, so group
    padding quantizes per superblock (~k_tiles× fewer pad slabs at large
    groups).  Per-slab row sums land in a (k_tiles, 128) accumulator via
    a masked add (2 VPU rows of work); the superblock's LAST group
    commits the accumulator into sublane 0 of each tile block.

    ``two_win``: win_ref packs (wa | wb<<16); the 4-bit iA's high bit
    picks between the two loaded windows per cell (one extra gather +
    select per slab — the fill gain pays for it ~3× over in HBM bytes)."""
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, super_ref[g] != super_ref[g - 1]))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sub = jax.lax.broadcasted_iota(jnp.int32, (k_tiles, _LANES), 0)
    acc = jnp.zeros((k_tiles, _LANES), jnp.float32)
    acc8 = jnp.zeros((8, _LANES), jnp.float32)  # runacc: value-carried
    for b in range(group):
        w = win_ref[g * group + b]
        if nibble:
            # int8 shifts don't legalize in Mosaic; widen to int32
            pk = idxA_ref[0, (b // 2) * 8:(b // 2 + 1) * 8, :].astype(
                jnp.int32)
            if b % 2:
                pk = jax.lax.shift_right_logical(pk, 4)
            iA4 = jnp.bitwise_and(pk, 15)
        elif two_win:
            iA4 = idxA_ref[0, b * 8:(b + 1) * 8, :].astype(jnp.int32)
        else:
            iA4 = idxA_ref[0, b * 8:(b + 1) * 8, :]
        iB = idxB_ref[0, b * 8:(b + 1) * 8, :]
        if two_win:
            wa = jnp.bitwise_and(w, 0xFFFF)
            wb = jax.lax.shift_right_logical(w, 16)
            xa = x_ref[pl.ds(pl.multiple_of(wa * 8, 8), 8), :]
            xb = x_ref[pl.ds(pl.multiple_of(wb * 8, 8), 8), :]
            ch = jnp.bitwise_and(iA4, 7).astype(jnp.int8)
            t1a = jnp.take_along_axis(xa, ch, axis=0)
            t1b = jnp.take_along_axis(xb, ch, axis=0)
            t1 = jnp.where(iA4 >= 8, t1b, t1a)
        else:
            xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
            t1 = jnp.take_along_axis(
                xw, iA4.astype(jnp.int8) if nibble else iA4, axis=0)
        gth = jnp.take_along_axis(t1, iB, axis=1)
        prod = vals_ref[0, b * 8:(b + 1) * 8, :] * gth
        i = g * group + b
        if acc_mode == "runacc":
            # run-accumulate (8,128) prods in registers; slabs are sorted
            # by tloc within the group, so a sum + dynamic-row commit
            # happens only when the tile changes (~1/100 slabs at XL) and
            # once at group end — ~2 VPU ops/slab instead of the masked
            # add's 3·(k_tiles/8)+3
            acc8 = acc8 + prod
            tl = tloc_ref[i]
            if b < group - 1:
                flush = tloc_ref[i] != tloc_ref[i + 1]

                @pl.when(flush)
                def _(acc8=acc8, tl=tl):
                    part = jnp.sum(acc8, axis=0, keepdims=True)
                    acc_ref[pl.ds(tl, 1), :] = (
                        acc_ref[pl.ds(tl, 1), :] + part)

                acc8 = jnp.where(flush, jnp.zeros_like(acc8), acc8)
            else:  # unconditional flush at group end
                part = jnp.sum(acc8, axis=0, keepdims=True)
                acc_ref[pl.ds(tl, 1), :] = acc_ref[pl.ds(tl, 1), :] + part
            continue
        part = jnp.sum(prod, axis=0, keepdims=True)  # (1, 128)
        if acc_mode == "rmw":
            # dynamic single-row read-modify-write per slab: measured
            # SLOWER (61.5 vs 64.6 Gnnz/s XL kt=32 — the per-slab VMEM
            # round trip serializes); kept for the record
            tl = tloc_ref[i]
            acc_ref[pl.ds(tl, 1), :] = acc_ref[pl.ds(tl, 1), :] + part
        else:
            acc = acc + jnp.where(sub == tloc_ref[i], part, 0.0)
    if acc_mode == "masked":
        acc_ref[:] = acc_ref[:] + acc

    @pl.when(commit_ref[g] == 1)
    def _():
        for tl in range(k_tiles):
            o_ref[tl * 8:tl * 8 + 1, :] = acc_ref[tl:tl + 1, :]


# accumulate mode for the superblock kernel (probe_dualgather_xl5):
#   "masked"  — per-slab masked add into (k_tiles,128); WINNER at k_tiles=8
#               (75.0 Gnnz/s XL two_win — the accumulator is 1 vreg)
#   "rmw"     — per-slab dynamic-row RMW: 61.5 Gnnz/s (VMEM round trip
#               serializes)
#   "runacc"  — register run-accumulate + commit on tile change: 6.3
#               Gnnz/s (per-slab predicated branches stall the pipeline)
# (all measured on the XL point, benchmarks/probe_dualgather_xl5)
_ACC_MODE = "masked"


@functools.partial(jax.jit, static_argnames=("group", "k_tiles", "n_super",
                                             "nibble", "two_win", "acc_mode",
                                             "interpret"))
def _dualgather_sb_call(group_super, slab_win, slab_tloc, commit, idxA,
                        idxB, vals, xp, *, group, k_tiles, n_super,
                        nibble=False, two_win=False, acc_mode="masked",
                        interpret=False):
    n_groups = idxA.shape[0]
    ia_rows = (group // 2 if nibble else group) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, ia_rows, _LANES),
                         lambda g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x (S,128)
        ],
        out_specs=pl.BlockSpec((8 * k_tiles, _LANES),
                               lambda g, s, w, t, cm: (s[g], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k_tiles, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dualgather_sb_kernel, group=group,
                          k_tiles=k_tiles, nibble=nibble, two_win=two_win,
                          acc_mode=acc_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_super * 8 * k_tiles, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(group_super, slab_win.reshape(-1), slab_tloc.reshape(-1), commit,
      idxA, idxB, vals, xp)


def _pooled_kernel(tile_ref, ptr_ref, idxA_ref, idxB_ref, vals_ref,
                   x_ref, o_ref, *, group: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        base = (g * group + b) * 8
        rows = [x_ref[pl.ds(ptr_ref[base + u], 1), :] for u in range(8)]
        xw = jnp.concatenate(rows, axis=0)  # per-sublane global chunks
        iA = idxA_ref[0, b * 8:(b + 1) * 8, :]
        iB = idxB_ref[0, b * 8:(b + 1) * 8, :]
        t1 = jnp.take_along_axis(xw, iA, axis=0)
        gth = jnp.take_along_axis(t1, iB, axis=1)
        acc = acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth
    part = jnp.sum(acc, axis=0, keepdims=True)
    o_ref[0:1, :] = o_ref[0:1, :] + part.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "interpret"))
def _pooled_call(group_tile, ptr, idxA, idxB, vals, xp, *, group,
                 n_tiles, interpret=False):
    n_groups = idxA.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES), lambda g, t, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x (S,128)
        ],
        out_specs=pl.BlockSpec((8, _LANES), lambda g, t, p: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_pooled_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, ptr.reshape(-1), idxA, idxB, vals, xp)


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
    if packed.k_tiles > 1:
        k = packed.k_tiles
        n_super = -(-packed.n_tiles // k)
        bounds = [0, *packed.splits, n_groups]
        for g0, g1 in zip(bounds[:-1], bounds[1:]):
            out = _dualgather_sb_call(
                packed.group_tile[g0:g1], packed.slab_win[g0:g1],
                packed.slab_tloc[g0:g1], packed.commit[g0:g1],
                packed.idxA[g0:g1], packed.idxB[g0:g1],
                packed.vals[g0:g1], xp,
                group=packed.group, k_tiles=k, n_super=n_super,
                nibble=packed.nibble, two_win=packed.two_win,
                acc_mode=_ACC_MODE,
                interpret=config.interpret(),
            )
            # sublane 0 of each tile block carries that tile's row sums
            out = out.reshape(n_super * k, 8, _LANES)[:, 0, :]
            touched = (
                jnp.zeros(n_super, bool)
                .at[packed.group_tile[g0:g1]]
                .set(True)
            )
            out = out.reshape(n_super, k, _LANES)
            out = jnp.where(touched[:, None, None], out, 0)
            y = y + out.reshape(n_super * k, _LANES)[:packed.n_tiles]
        if packed.tail is not None:
            y = y + _pooled_forward(packed.tail, xp)
        return y.reshape(packed.n_tiles * _T)[:rows]
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
    if packed.tail is not None:
        y = y + _pooled_forward(packed.tail, xp)
    return y.reshape(packed.n_tiles * _T)[:rows]


def _pooled_forward(tail: PooledDG, xp):
    """Tail contribution as (n_tiles, 128); xp is the padded (S,128) x."""
    n_groups = tail.idxA.shape[0]
    # ptr adds 8 int32 per slab to the prefetch budget
    chunk = max(1, _SMEM_PREFETCH_BUDGET // (4 * (8 * tail.group + 1)))
    y = jnp.zeros((tail.n_tiles, _T), jnp.float32)
    for g0 in range(0, n_groups, chunk):
        g1 = min(g0 + chunk, n_groups)
        out = _pooled_call(
            tail.group_tile[g0:g1], tail.ptr[g0:g1],
            tail.idxA[g0:g1], tail.idxB[g0:g1], tail.vals[g0:g1], xp,
            group=tail.group, n_tiles=tail.n_tiles,
            interpret=config.interpret(),
        )
        out = out.reshape(tail.n_tiles, 8, _LANES)[:, 0, :]
        touched = (
            jnp.zeros(tail.n_tiles, bool)
            .at[tail.group_tile[g0:g1]]
            .set(True)
        )
        y = y + jnp.where(touched[:, None], out, 0)
    return y


def _slot_row_col(packed: DualGather):
    """Per-slot (row, col) reconstruction for the jnp fallback paths.

    cl comes from idxB at the slot; its chunk from idxA at (u, cl)."""
    n_groups, GH, _ = packed.idxB.shape
    group = packed.group
    iB4 = packed.idxB.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    if packed.nibble:
        pk = packed.idxA.reshape(n_groups, group // 2, 8,
                                 _LANES).astype(jnp.int32)
        iA4 = jnp.stack([pk & 15, (pk >> 4) & 15], axis=2).reshape(
            n_groups, group, 8, _LANES)
    else:
        iA4 = packed.idxA.reshape(n_groups, group, 8, _LANES).astype(
            jnp.int32)
    ch = jnp.take_along_axis(iA4, iB4, axis=3)  # (n_groups, group, 8, 128)
    win = packed.slab_win[:, :, None, None]
    if packed.two_win:
        # win packs (wa | wb<<16); iA's 4th bit picks the window
        wa = jnp.bitwise_and(win, 0xFFFF)
        wb = jax.lax.shift_right_logical(win, 16)
        win = jnp.where(ch >= 8, wb, wa)
        ch = jnp.bitwise_and(ch, 7)
    col = win * _W + ch * _LANES + iB4
    lane = jnp.arange(_LANES)[None, None, None, :]
    if packed.k_tiles > 1:
        tile = (packed.group_tile[:, None] * packed.k_tiles
                + packed.slab_tloc)[:, :, None, None]
    else:
        tile = packed.group_tile[:, None, None, None]
    row = tile * _T + lane
    return (jnp.broadcast_to(row, col.shape).reshape(n_groups, GH, _LANES),
            col.reshape(n_groups, GH, _LANES))


def _slot_row_col_pooled(tail: PooledDG):
    """Per-slot (row, col) for pooled slabs: the chunk is looked up via
    the slab's pointer table at idxA[u, idxB[u, l]]."""
    n_groups, GH, _ = tail.idxB.shape
    group = tail.group
    iB4 = tail.idxB.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    iA4 = tail.idxA.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    slot_k = jnp.take_along_axis(iA4, iB4, axis=3)  # (ng, group, 8, 128)
    ptr_b = jnp.broadcast_to(
        tail.ptr[:, :, :, None].astype(jnp.int32),
        (n_groups, group, 8, _LANES))
    chunk = jnp.take_along_axis(ptr_b, slot_k, axis=2)
    col = chunk * _LANES + iB4
    lane = jnp.arange(_LANES)[None, None, None, :]
    row = tail.group_tile[:, None, None, None] * _T + lane
    return (jnp.broadcast_to(row, col.shape).reshape(n_groups, GH, _LANES),
            col.reshape(n_groups, GH, _LANES))


def _dualgather_matvec_t_jnp(packed: DualGather, g):
    """``A^T @ g`` from the slab arrays alone (XLA scatter fallback for the
    VJP when no transposed pack was built — correct, not fast)."""
    row, col = _slot_row_col(packed)
    gv = g[row] * packed.vals
    cols = packed.shape[1]
    out = jnp.zeros((cols,), packed.vals.dtype)
    out = out.at[col.reshape(-1)].add(gv.reshape(-1))
    if packed.tail is not None:
        trow, tcol = _slot_row_col_pooled(packed.tail)
        tgv = g[trow] * packed.tail.vals
        out = out.at[tcol.reshape(-1)].add(tgv.reshape(-1).astype(out.dtype))
    return out


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
    if packed.tail is not None:
        trow, tcol = _slot_row_col_pooled(packed.tail)
        tmask = packed.tail.vals != 0
        dtail_vals = jnp.where(tmask, xpad[tcol] * gpad[trow], 0).astype(
            packed.tail.vals.dtype)
        dpacked = dataclasses.replace(
            dpacked,
            tail=dataclasses.replace(dpacked.tail, vals=dtail_vals))
    return dpacked, gx


spmv_dualgather.defvjp(_dg_fwd, _dg_bwd)
