"""Octet-slab SpMV — the low-degree layout (rows/slab = 1024).

The dual-gather/superblock layouts key a slab to ONE 128-row tile: lanes
are the tile's rows and the 8 sublanes hold window chunks.  For matrices
with ~1 entry per row (SpGEMM pair programs — pairs/slot ≈ 1.01 at the
XL bench point — permutation-like maps, thin bands) that caps fill at
deg/8: 7 of 8 sublane cells per lane are structurally empty, and the
packed pair program measured fill 0.11 with ~0.9 µs of grid-step
overhead per ~110 useful pairs.

The octet slab spans EIGHT consecutive tiles: cell (u, l) is row
``octet*1024 + u*128 + l`` and the commit is a contiguous dynamic
(8,128) block add — no sublane reduction, every vreg row is a real
output row.

Routing is THREE chained (8,128) gathers (the Beneš lesson): the
two-gather dual-gather addressing shares one chunk cell per (sublane,
position), and on the XL pair program 3.5 M of 4.4 M entries collided
there (measured — depth repair settled at fill 0.10, no better than the
superblock).  A middle "slot" stage removes the bottleneck:

    t1[c, m] = xw[c, POS[c, m]]     (pos plane:   axis-1 gather)
    t2[u, m] = t1[CH[u, m], m]      (chunk plane: axis-0 gather)
    y [u, l] = t2[u, RT[u, l]]      (lane route:  axis-1 gather)

Each entry (u, l) ← window (c, p) needs an ``m`` with CH[u, m] = c and
POS[c, m] = p; ``m`` is FREE per entry, so the packer just assigns slots
(greedy + vectorized direct-address repair; load ~17 entries per 128
slots, collisions are rare).  Entries sharing a (u, l) cell (row degree
within the window) go one depth (slab) deeper — the only structural
depth left.

No reference analogue (the reference has no SpGEMM); built against
SURVEY §7 phase C's "hardest single-chip math" budget.
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
from ..formats import CSR
from ..formats.base import register_sparse_pytree

__all__ = ["Octet", "pack_octet", "spmv_octet", "spmm_octet"]

_LANES = 128
_ROWS_PER_OCTET = 1024
_W = 1024  # window width (8 chunks × 128)


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class Octet:
    pos: jnp.ndarray  # (n_groups, group*8, 128) int8: POS per (chunk, m)
    chk: jnp.ndarray  # (n_groups, group*8, 128) int8: CH per (u, m)
    route: jnp.ndarray  # (n_groups, group*8, 128) int8: m per (u, l)
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_super: jnp.ndarray  # (n_groups,) int32 — superblock id, sorted
    slab_win: jnp.ndarray  # (n_groups, group) int32
    slab_oloc: jnp.ndarray  # (n_groups, group) int32 — octet within super
    commit: jnp.ndarray  # (n_groups,) int32 — last group of its super
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_octets: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    k_octets: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})
    splits: Tuple[int, ...] = dataclasses.field(
        default=(), metadata={"static": True})
    # optional trim section: the remainder slabs of every superblock run
    # grouped at a finer granularity (its own Octet, rem=None) — cuts
    # the per-run group padding (pack_octet trim_group)
    rem: object = None

    @property
    def fill_rate(self) -> float:
        sz = self.vals.size + (self.rem.vals.size
                               if self.rem is not None else 0)
        return self.nnz / max(sz, 1)


def _assign_native(ow, u, chunk, pos, lane):
    """Native one-pass depth+slot assignment (codec.cc:
    smtpu_assign_octet); returns (d, m) or None when unavailable."""
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if lib is None or not hasattr(lib, "smtpu_assign_octet") or not len(ow):
        return None
    import ctypes

    ow_c = np.ascontiguousarray(ow, np.int64)
    u_c = np.ascontiguousarray(u, np.int32)
    l_c = np.ascontiguousarray(lane, np.int32)
    c_c = np.ascontiguousarray(chunk, np.int32)
    p_c = np.ascontiguousarray(pos, np.int32)
    out_d = np.empty(len(ow), np.int32)
    out_m = np.empty(len(ow), np.int8)
    rc = lib.smtpu_assign_octet(
        ow_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        u_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        l_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ow), int(ow_c.max()) + 1,
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc < 0:
        return None
    return out_d.astype(np.int64), out_m.astype(np.int64)


def _assign_slots(ow, d, u, chunk, pos, lane, n_rounds=200):
    """Per-entry middle slot ``m``: distinct within (slab, u), and the
    (slab, chunk, m) pos-plane cell must agree on ``pos``.

    Direct-address repair: flat occupancy tables indexed by
    ``slab*1024 + {u|c}*128 + m``; losers re-propose rotated slots.
    Returns (m, extra_depth_mask) — entries that could not place after
    ``n_rounds`` must bump depth (rare: load ≈ deg/8 per 128 slots)."""
    nnz = len(ow)
    slab_key, slab_of = np.unique(
        np.stack([ow, d]), axis=1, return_inverse=True)
    n_slabs = slab_key.shape[1]
    cellU = np.zeros(n_slabs * 8 * _LANES, np.uint8)
    posT = np.zeros(n_slabs * 8 * _LANES, np.int16)  # pos+1, 0 = empty
    # seed each entry at its LANE: distinct within (slab, u), so the
    # whole sublane can place in round 0 (a uniform seed makes every
    # sublane-mate propose the same slot — one winner per round)
    m = lane.astype(np.int64).copy()
    placed = np.zeros(nnz, bool)
    pending = np.arange(nnz)
    rng_off = 0
    for rnd in range(n_rounds):
        if len(pending) == 0:
            break
        cand = (m[pending] + rng_off) % _LANES
        ku = slab_of[pending] * (8 * _LANES) + u[pending] * _LANES + cand
        kc = (slab_of[pending] * (8 * _LANES)
              + chunk[pending] * _LANES + cand)
        ok = (cellU[ku] == 0) & (
            (posT[kc] == 0) | (posT[kc] == pos[pending] + 1))
        # first-by-index winner among same-round collisions on ku or on a
        # NEW kc cell with a different pos
        idx = pending[ok]
        ku_ok, kc_ok = ku[ok], kc[ok]
        cnd_ok = cand[ok]
        # resolve ku collisions
        o1 = np.lexsort((idx, ku_ok))
        k1s = ku_ok[o1]
        w1 = np.concatenate([[True], k1s[1:] != k1s[:-1]])
        keep1 = np.zeros(len(idx), bool)
        keep1[o1] = w1
        # resolve kc collisions among the ku winners: same kc cell must
        # share pos; first-by-index wins, same-pos followers are fine
        sel = keep1
        idx2 = idx[sel]
        if len(idx2) == 0:
            m[pending] = (m[pending] + 1) % _LANES
            rng_off = (rng_off * 5 + 1) % _LANES
            continue
        kc2 = kc_ok[sel]
        p2 = pos[idx2]
        o2 = np.lexsort((idx2, kc2))
        k2s, p2s = kc2[o2], p2[o2]
        first2 = np.concatenate([[True], k2s[1:] != k2s[:-1]])
        # group-leader pos per kc cell (vectorized segment fill)
        gseg = np.cumsum(first2) - 1
        lead = p2s[np.flatnonzero(first2)][gseg]
        keep2 = np.zeros(len(idx2), bool)
        keep2[o2] = p2s == lead
        final_idx = idx2[keep2]
        final_m = cnd_ok[sel][keep2]
        m[final_idx] = final_m
        placed[final_idx] = True
        fku = (slab_of[final_idx] * (8 * _LANES)
               + u[final_idx] * _LANES + final_m)
        fkc = (slab_of[final_idx] * (8 * _LANES)
               + chunk[final_idx] * _LANES + final_m)
        cellU[fku] = 1
        posT[fkc] = pos[final_idx] + 1
        pending = pending[~placed[pending]]
        m[pending] = (m[pending] + 1) % _LANES
        rng_off = (rng_off * 5 + 1) % _LANES
    return m, ~placed


def pack_octet(csr: CSR, group: int = 8, k_octets: int = 32,
               dtype=None, trim_group: int | None = None) -> Octet:
    """Pack a CSR for the octet kernel.

    Right for LOW row degrees (≲ 2-3 per window): each additional entry
    of a row within one window costs a full slab depth — use
    ``pack_dualgather`` for dense rows.

    ``trim_group``: when set (< group), the remainder slabs of each
    superblock run — the per-run padding to a multiple of ``group``,
    ~13 % of streamed plane bytes at group 32 on the XL pair program —
    are regrouped at this finer granularity in a second section
    (``Octet.rem``), run as its own pallas call whose commits are
    summed with the main section's."""
    sp = csr.to_scipy().tocsr()
    sp.sum_duplicates()
    sp.sort_indices()
    rows, cols = sp.shape
    r = np.repeat(np.arange(rows), np.diff(sp.indptr)).astype(np.int64)
    c = sp.indices.astype(np.int64)
    v = sp.data
    nnz = len(r)
    n_octets = max(-(-rows // _ROWS_PER_OCTET), 1)
    n_win = max(-(-cols // _W), 1)
    vnp = v.dtype if dtype is None else np.dtype(dtype)

    if nnz == 0:
        z3 = lambda dt: jnp.zeros((1, group * 8, _LANES), dt)
        return Octet(
            pos=z3(jnp.int8), chk=z3(jnp.int8), route=z3(jnp.int8),
            vals=z3(vnp),
            group_super=jnp.zeros((1,), jnp.int32),
            slab_win=jnp.zeros((1, group), jnp.int32),
            slab_oloc=jnp.zeros((1, group), jnp.int32),
            commit=jnp.ones((1,), jnp.int32),
            shape=(rows, cols), n_octets=n_octets, n_win=n_win,
            group=group, k_octets=k_octets, nnz=0)

    octet = r // _ROWS_PER_OCTET
    u = (r // _LANES) % 8
    lane = r % _LANES
    w = c // _W
    chunk = (c % _W) // _LANES
    pos = c % _LANES
    ow = octet * n_win + w

    # depth: occurrence rank within the (ow, u, l) cell (row degree
    # inside the window — the only structural depth); then slot
    # assignment, bumping unplaceable entries one depth deeper
    native = _assign_native(ow, u, chunk, pos, lane)
    if native is not None:
        d, m = native
    else:
        key_cell = (ow * 8 + u) * _LANES + lane
        order = np.argsort(key_cell, kind="stable")
        base = np.zeros(nnz, np.int64)
        ks = key_cell[order]
        newgrp = np.concatenate([[True], ks[1:] != ks[:-1]])
        gid = np.cumsum(newgrp) - 1
        first_idx = np.zeros(gid[-1] + 1, np.int64)
        first_idx[gid[newgrp]] = np.flatnonzero(newgrp)
        base[order] = np.arange(nnz) - first_idx[gid]
        # bump unit > any cell rank, so stuck entries move to strictly
        # deeper slabs without colliding with a cell-mate's depth (a
        # per-cell re-rank resets singleton bumps — measured livelock)
        big = int(base.max()) + 1
        extra = np.zeros(nnz, np.int64)
        for _attempt in range(64):
            d = base + extra
            m, overflow = _assign_slots(ow, d, u, chunk, pos, lane)
            if not overflow.any():
                break
            extra = extra + big * overflow
        else:
            raise RuntimeError("octet slot assignment did not converge")

    # slab ids ordered by (octet, w, d)
    dmax = int(d.max()) + 1
    slab_key = (octet * n_win + w) * dmax + d
    uslab, slab_of = np.unique(slab_key, return_inverse=True)
    n_slabs = len(uslab)
    s_oct = (uslab // dmax) // n_win
    s_win = (uslab // dmax) % n_win
    s_super = s_oct // k_octets

    # trim: each superblock run pads to a multiple of `group` — at
    # group 32 that is ~13 % of the streamed plane bytes on the XL pair
    # program (DESIGN.md r5 floor accounting).  With `trim_group` set,
    # the remainder slabs of every run move to a SECOND section grouped
    # at the finer granularity (a separate pallas call whose commit
    # flags are its own last-group-of-super — the forward sums the two
    # partial commits per superblock).
    section = np.zeros(n_slabs, np.int8)
    if trim_group and trim_group < group:
        i = 0
        while i < n_slabs:
            j = i
            while j < n_slabs and s_super[j] == s_super[i]:
                j += 1
            full = ((j - i) // group) * group
            section[i + full:j] = 1
            i = j
        if not section.any() or not (section == 0).any():
            section[:] = 0  # nothing to trim / no full group anywhere

    def _group_section(sel, grp):
        """Group the selected slabs (ascending ids) at granularity
        ``grp``, padding each superblock run to a multiple of ``grp``;
        returns the per-slab slot plus the group-level arrays."""
        idxs = np.flatnonzero(sel)
        n_sel = len(idxs)
        slot_of = np.full(n_slabs, -1, np.int64)
        n_g = 0
        g_super, g_win, g_oloc = [], [], []
        i = 0
        while i < n_sel:
            j = i
            while j < n_sel and s_super[idxs[j]] == s_super[idxs[i]]:
                j += 1
            for t in range(i, j):
                slot_of[idxs[t]] = (n_g + (t - i) // grp) * grp \
                    + (t - i) % grp
            for gg in range(-(-(j - i) // grp)):
                lo = i + gg * grp
                hi = min(lo + grp, j)
                g_super.append(int(s_super[idxs[i]]))
                wrow = np.zeros(grp, np.int64)
                orow = np.zeros(grp, np.int64)
                wrow[: hi - lo] = s_win[idxs[lo:hi]]
                orow[: hi - lo] = s_oct[idxs[lo:hi]] % k_octets
                if hi - lo < grp:  # padding slabs repeat the last
                    wrow[hi - lo:] = s_win[idxs[hi - 1]]
                    orow[hi - lo:] = s_oct[idxs[hi - 1]] % k_octets
                g_win.append(wrow)
                g_oloc.append(orow)
                n_g += 1
            i = j
        group_super = np.asarray(g_super, np.int64)
        commit = np.zeros(n_g, np.int64)
        commit[np.concatenate([group_super[1:] != group_super[:-1],
                               [True]])] = 1
        return slot_of, group_super, np.stack(g_win), np.stack(g_oloc), \
            commit, n_g

    from .spmv_dualgather import _SMEM_PREFETCH_BUDGET

    def _build_section(sel, grp, total_nnz, rem):
        slot_of_slab, group_super, slab_win, slab_oloc, commit, n_g = \
            _group_section(sel, grp)
        posP = np.zeros((n_g, grp * 8, _LANES), np.int8)
        chkP = np.zeros((n_g, grp * 8, _LANES), np.int8)
        rteP = np.zeros((n_g, grp * 8, _LANES), np.int8)
        vals = np.zeros((n_g, grp * 8, _LANES), vnp)
        emask = sel[slab_of]
        slot = slot_of_slab[slab_of[emask]]
        gi, bi = slot // grp, slot % grp
        posP[gi, bi * 8 + chunk[emask], m[emask]] = \
            pos[emask].astype(np.int8)
        chkP[gi, bi * 8 + u[emask], m[emask]] = \
            chunk[emask].astype(np.int8)
        rteP[gi, bi * 8 + u[emask], lane[emask]] = m[emask].astype(np.int8)
        vals[gi, bi * 8 + u[emask], lane[emask]] = v[emask].astype(vnp)

        per_group_scalars = 2 * grp + 2
        max_groups = max(1,
                         _SMEM_PREFETCH_BUDGET // (4 * per_group_scalars))
        splits = []
        if n_g > max_groups:
            start = 0
            while n_g - start > max_groups:
                cut = start + max_groups
                while cut > start and \
                        group_super[cut] == group_super[cut - 1]:
                    cut -= 1
                if cut == start:
                    # one superblock's groups exceed the prefetch
                    # budget: a mid-superblock cut would strand the
                    # accumulator partial in a call whose commit flag
                    # lives in the next call (mirrors
                    # dualgather._sb_splits)
                    raise ValueError(
                        "octet superblock exceeds the SMEM prefetch "
                        "budget; use a smaller k_octets (fewer octets "
                        "per accumulator) so commit boundaries come "
                        "sooner")
                splits.append(cut)
                start = cut
        return Octet(
            pos=jnp.asarray(posP), chk=jnp.asarray(chkP),
            route=jnp.asarray(rteP), vals=jnp.asarray(vals),
            group_super=jnp.asarray(group_super, jnp.int32),
            slab_win=jnp.asarray(slab_win, jnp.int32),
            slab_oloc=jnp.asarray(slab_oloc, jnp.int32),
            commit=jnp.asarray(commit, jnp.int32),
            shape=(rows, cols), n_octets=n_octets, n_win=n_win,
            group=grp, k_octets=k_octets, nnz=int(total_nnz),
            splits=tuple(splits), rem=rem)

    if section.any():
        rem = _build_section(section == 1, trim_group,
                             int((section[slab_of] == 1).sum()), None)
        return _build_section(section == 0, group, nnz, rem)
    return _build_section(section == 0, group, nnz, None)


def _octet_kernel(super_ref, win_ref, oloc_ref, commit_ref, pos_ref,
                  chk_ref, rte_ref, vals_ref, x_ref, o_ref, acc_ref, *,
                  group: int, k_octets: int):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, super_ref[g] != super_ref[g - 1]))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for b in range(group):
        w = win_ref[g * group + b]
        pp = pos_ref[0, b * 8:(b + 1) * 8, :]
        ck = chk_ref[0, b * 8:(b + 1) * 8, :]
        rt = rte_ref[0, b * 8:(b + 1) * 8, :]
        vv = vals_ref[0, b * 8:(b + 1) * 8, :]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        t1 = jnp.take_along_axis(xw, pp, axis=1)   # t1[c,m]=xw[c,POS[c,m]]
        t2 = jnp.take_along_axis(t1, ck, axis=0)   # t2[u,m]=t1[CH[u,m],m]
        gth = jnp.take_along_axis(t2, rt, axis=1)  # [u,l]=t2[u,RT[u,l]]
        prod = (vv * gth).astype(jnp.float32)
        ol = oloc_ref[g * group + b]
        # contiguous (8,128) block RMW — every vreg row is a real output
        # row (per-slab (1,128) RMW cost ~5 % in probe_dualgather_xl5; at
        # 8 rows of work per trip it amortizes)
        acc_ref[pl.ds(ol * 8, 8), :] = acc_ref[pl.ds(ol * 8, 8), :] + prod

    @pl.when(commit_ref[g] == 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "k_octets",
                                             "n_super", "interpret"))
def _octet_call(group_super, slab_win, slab_oloc, commit, posP, chkP,
                rteP, vals, xp, *, group, k_octets, n_super,
                interpret=False):
    n_groups = posP.shape[0]
    plane = lambda: pl.BlockSpec((1, group * 8, _LANES),
                                 lambda g, s, w, t, cm: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[plane(), plane(), plane(), plane(),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # padded x
        out_specs=pl.BlockSpec((k_octets * 8, _LANES),
                               lambda g, s, w, t, cm: (s[g], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k_octets * 8, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_octet_kernel, group=group, k_octets=k_octets),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super * k_octets * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(group_super, slab_win.reshape(-1), slab_oloc.reshape(-1), commit,
      posP, chkP, rteP, vals, xp)


def _slot_row_col(packed: Octet):
    """Per-cell (row, col) reconstruction for the jnp/VJP paths."""
    n_groups = packed.route.shape[0]
    group = packed.group
    rt = packed.route.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    ck = packed.chk.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    pp = packed.pos.reshape(n_groups, group, 8, _LANES).astype(jnp.int32)
    ch = jnp.take_along_axis(ck, rt, axis=3)          # chunk per (u, l)
    # pos per (u, l) = POS[ch[u,l], rt[u,l]] — one flat gather over the
    # (chunk, m) plane (jnp fallback path, arbitrary gathers are fine)
    n_g, grp = pp.shape[0], pp.shape[1]
    flat = pp.reshape(n_g, grp, 8 * _LANES)
    idx = (ch * _LANES + rt).reshape(n_g, grp, 8 * _LANES)
    pUL = jnp.take_along_axis(flat, idx, axis=2).reshape(
        n_g, grp, 8, _LANES)
    win = packed.slab_win[:, :, None, None]
    col = win * _W + ch * _LANES + pUL
    octt = (packed.group_super[:, None] * packed.k_octets
            + packed.slab_oloc)[:, :, None, None]
    sub = jnp.arange(8)[None, None, :, None]
    lane = jnp.arange(_LANES)[None, None, None, :]
    row = octt * _ROWS_PER_OCTET + sub * _LANES + lane
    return row, col


def _octet_forward(packed: Octet, x):
    rows, cols = packed.shape
    S = packed.n_win * 8
    xp = (jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x)
          .reshape(S, _LANES))
    n_groups = packed.pos.shape[0]
    n_super = -(-packed.n_octets // packed.k_octets)
    bounds = [0, *packed.splits, n_groups]
    y = jnp.zeros((n_super, packed.k_octets * _ROWS_PER_OCTET),
                  jnp.float32)
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        out = _octet_call(
            packed.group_super[g0:g1], packed.slab_win[g0:g1],
            packed.slab_oloc[g0:g1], packed.commit[g0:g1],
            packed.pos[g0:g1], packed.chk[g0:g1], packed.route[g0:g1],
            packed.vals[g0:g1], xp, group=packed.group,
            k_octets=packed.k_octets, n_super=n_super,
            interpret=config.interpret(),
        )
        touched = (
            jnp.zeros(n_super, bool)
            .at[packed.group_super[g0:g1]]
            .set(True)
        )
        out = out.reshape(n_super, packed.k_octets * _ROWS_PER_OCTET)
        y = y + jnp.where(touched[:, None], out, 0)
    y = y.reshape(-1)[:rows]
    if packed.rem is not None:
        y = y + _octet_forward(packed.rem, x)
    return y


@jax.custom_vjp
def spmv_octet(packed: Octet, x):
    """``y = A @ x`` over an octet pack (jittable; differentiable in x
    and in the slab values)."""
    return _octet_forward(packed, x)


def _oct_fwd(packed, x):
    return _octet_forward(packed, x), (packed, x)


def _oct_bwd(res, g):
    packed, x = res
    rows, cols = packed.shape
    row, col = _slot_row_col(packed)
    gpad = jnp.concatenate([g, jnp.zeros((1,), g.dtype)])
    row_cl = jnp.minimum(row, rows)  # padding cells (vals 0) → sink
    xpad = jnp.zeros((packed.n_win * _W,), x.dtype).at[:cols].set(x)
    n_groups = packed.route.shape[0]
    vals4 = packed.vals.reshape(n_groups, packed.group, 8, _LANES)
    gv = gpad[row_cl] * vals4
    gx = (jnp.zeros((packed.n_win * _W,), x.dtype)
          .at[col.reshape(-1)]
          .add(gv.reshape(-1).astype(x.dtype)))[:cols]
    dvals = (xpad[col] * gpad[row_cl]).astype(packed.vals.dtype)
    dvals = jnp.where(vals4 != 0, dvals, 0)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(
        dpacked, vals=dvals.reshape(packed.vals.shape))
    if packed.rem is not None:
        dprem, gx_rem = _oct_bwd((packed.rem, x), g)
        gx = gx + gx_rem
        dpacked = dataclasses.replace(dpacked, rem=dprem)
    return dpacked, gx


spmv_octet.defvjp(_oct_fwd, _oct_bwd)


# ---------------------------------------------------------------------------
# Multi-RHS walk over octet packs: the spmm_dualgather superblock pattern
# (fori_loop per RHS column, slabs unrolled, per-column accumulator) with
# the octet kernel's 3-stage routing and (8,128) block commits.
# ---------------------------------------------------------------------------


_KP_MM = 8  # columns per panel


def _octet_mm_kernel(super_ref, win_ref, oloc_ref, commit_ref, pos_ref,
                     chk_ref, rte_ref, vals_ref, xt_ref, o_ref, acc_ref,
                     *, group: int, k_octets: int, kp: int):
    g = pl.program_id(1)

    @pl.when(jnp.logical_or(g == 0, super_ref[g] != super_ref[g - 1]))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def col(j, carry):
        for b in range(group):
            w = win_ref[g * group + b]
            pp = pos_ref[0, b * 8:(b + 1) * 8, :]
            ck = chk_ref[0, b * 8:(b + 1) * 8, :]
            rt = rte_ref[0, b * 8:(b + 1) * 8, :]
            vv = vals_ref[0, b * 8:(b + 1) * 8, :]
            xw = xt_ref[j, pl.ds(pl.multiple_of(w * 8, 8), 8), :]
            t1 = jnp.take_along_axis(xw, pp, axis=1)
            t2 = jnp.take_along_axis(t1, ck, axis=0)
            gth = jnp.take_along_axis(t2, rt, axis=1)
            prod = (vv * gth).astype(jnp.float32)
            ol = oloc_ref[g * group + b]
            base = j * (k_octets * 8) + ol * 8
            acc_ref[pl.ds(base, 8), :] = acc_ref[pl.ds(base, 8), :] + prod
        return carry

    jax.lax.fori_loop(0, kp, col, 0)

    @pl.when(commit_ref[g] == 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "k_octets",
                                             "n_super", "kp", "interpret"))
def _octet_mm_call(group_super, slab_win, slab_oloc, commit, posP, chkP,
                   rteP, vals, xt, *, group, k_octets, n_super, kp,
                   interpret=False):
    n_groups = posP.shape[0]
    k_pad, S = xt.shape[0], xt.shape[1]
    n_panels = k_pad // kp
    plane = lambda: pl.BlockSpec((1, group * 8, _LANES),
                                 lambda p, g, s, w, t, cm: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_panels, n_groups),
        in_specs=[plane(), plane(), plane(), plane(),
                  pl.BlockSpec((kp, S, _LANES),
                               lambda p, g, s, w, t, cm: (p, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((kp * k_octets * 8, _LANES),
                               lambda p, g, s, w, t, cm: (
                                   p * n_super + s[g], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kp * k_octets * 8, _LANES),
                                   jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_octet_mm_kernel, group=group,
                          k_octets=k_octets, kp=kp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_panels * n_super * kp * k_octets * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(group_super, slab_win.reshape(-1), slab_oloc.reshape(-1), commit,
      posP, chkP, rteP, vals, xt)


@jax.custom_vjp
def spmm_octet(packed: Octet, X):
    """``Y = A @ X`` over an octet pack (jittable; differentiable in X
    and in the slab values — the spmv_octet VJP generalized over the RHS
    panel, same backward-pass stance as spmm_dualgather: the X cotangent
    is the XLA scatter ``A^T @ G``, correct rather than fast)."""
    return _octet_mm_forward(packed, X)


def _octet_mm_forward(packed: Octet, X):
    rows, cols = packed.shape
    k = X.shape[1]
    S = packed.n_win * 8
    # panel width: keep the whole RHS resident when it fits VMEM — the
    # planes then stream ONCE instead of once per panel (measured the
    # difference between losing and winning vs the kt1 walk at the
    # low-degree XL point: n_panels=4 restreamed ~4x the plane bytes)
    budget = 6 << 20
    kp_fit = max(1, budget // max(S * _LANES * 4, 1))
    kp_acc = max(1, budget // max(packed.k_octets * 8 * _LANES * 4, 1))
    kp = max(_KP_MM, min(kp_fit, kp_acc))
    kp = min(kp, k)
    k_pad = -(-k // kp) * kp
    Xp = jnp.zeros((S * _LANES, k_pad), X.dtype).at[:cols, :k].set(X)
    xt = Xp.T.reshape(k_pad, S, _LANES)
    n_super = -(-packed.n_octets // packed.k_octets)
    n_groups = packed.pos.shape[0]
    bounds = [0, *packed.splits, n_groups]
    rows_blk = packed.k_octets * _ROWS_PER_OCTET
    y = jnp.zeros((n_super, k_pad, rows_blk), jnp.float32)
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        out = _octet_mm_call(
            packed.group_super[g0:g1], packed.slab_win[g0:g1],
            packed.slab_oloc[g0:g1], packed.commit[g0:g1],
            packed.pos[g0:g1], packed.chk[g0:g1], packed.route[g0:g1],
            packed.vals[g0:g1], xt, group=packed.group,
            k_octets=packed.k_octets, n_super=n_super, kp=kp,
            interpret=config.interpret(),
        )
        touched = (
            jnp.zeros(n_super, bool)
            .at[packed.group_super[g0:g1]]
            .set(True)
        )
        out = out.reshape(k_pad // kp, n_super, kp, rows_blk)
        out = jnp.where(touched[None, :, None, None], out, 0)
        out = out.transpose(1, 0, 2, 3).reshape(n_super, k_pad, rows_blk)
        y = y + out
    y = y.transpose(0, 2, 1).reshape(n_super * rows_blk, k_pad)
    y = y[:rows, :k]
    if packed.rem is not None:
        y = y + _octet_mm_forward(packed.rem, X)
    return y


def _oct_mm_fwd(packed, X):
    return _octet_mm_forward(packed, X), (packed, X)


def _oct_mm_bwd(res, G):
    packed, X = res
    rows, cols = packed.shape
    k = X.shape[1]
    row, col = _slot_row_col(packed)  # (n_groups, group, 8, 128)
    row_cl = jnp.minimum(row, rows)  # padding cells (vals 0) → sink row
    Gpad = jnp.zeros((rows + 1, k), G.dtype).at[:rows].set(G)
    Xpad = jnp.zeros((packed.n_win * _W, k), X.dtype).at[:cols].set(X)
    n_groups = packed.route.shape[0]
    vals4 = packed.vals.reshape(n_groups, packed.group, 8, _LANES)
    gv = Gpad[row_cl] * vals4[..., None]
    gX = (jnp.zeros((packed.n_win * _W, k), X.dtype)
          .at[col.reshape(-1)]
          .add(gv.reshape(-1, k).astype(X.dtype)))[:cols]
    dvals = jnp.where(
        vals4 != 0, jnp.sum(Xpad[col] * Gpad[row_cl], axis=-1), 0
    ).astype(packed.vals.dtype)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(
        dpacked, vals=dvals.reshape(packed.vals.shape))
    if packed.rem is not None:
        dprem, gX_rem = _oct_mm_bwd((packed.rem, X), G)
        gX = gX + gX_rem
        dpacked = dataclasses.replace(dpacked, rem=dprem)
    return dpacked, gX


spmm_octet.defvjp(_oct_mm_fwd, _oct_mm_bwd)
