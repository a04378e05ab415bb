"""Row-lane SELL SpMV — the round-2 speed-of-light push.

The round-1 kernels (``spmv_pallas.py``) gather x along *sublanes*
(axis=0), which forces ``lane = col % 128`` and leaves the row label free —
so the per-slab reduction needs R masked sums (~2R VPU passes).  This
variant transposes the roles:

  * x is viewed as (S, 128); a 1024-column **window** is an (8, 128) tile
    whose sublane ``u`` holds columns ``[w*1024 + u*128, w*1024+(u+1)*128)``.
  * An entry (r, c, v) must sit at sublane ``u = (c % 1024) // 128`` (its
    column chunk) and stores ``s_idx = c % 128``; the **lane is the row
    slot**: lane ``l`` serves matrix row ``t*T + (l % T)`` of row-tile
    ``t`` (T = 128 // lanes_per_row rows per tile).
  * The gather is the *other* legal (8, 128) ``take_along_axis``
    (axis=1): ``g[u, l] = xw[u, s_idx[u, l]] = x[c]``.
  * Because the lane fixes the row, the whole reduction for a grid step of
    ``group`` slabs is ONE sublane sum (axis=0) — independent of how many
    rows share a lane — vs 2R passes in the round-1 design.  Per-slab
    work: dynamic window slice + gather + fma.
  * ``lanes_per_row`` L gives each row L lane slots (l = r%T + m*T),
    cutting collision depth ~L× for 128/L rows per tile; the extra
    row-sum fold happens once on the host-visible output, not per slab.

Collision model: entries of row r in the same 128-column chunk of the same
window compete for one (u, l) slot per slab; occurrence d lands in slab
``d // L``.  Slab count per (tile, window) = ceil(max bucket / L), so fill
is bounded by mean/max bucket size — the packer reports it.  MEASURED
VERDICT on capped depth: not a performance knob on this hardware.  With
``spill_depth`` the tail goes to lane-free masked-sum slabs (an XLA tail
measured 410 µs for 2% of entries; the masked tail still costs ~240 ns ×
~1000 near-empty slabs ≈ 250 µs — 10× the fill saving).  The uncapped
auto config is the fast one (49 Gnnz/s); ``spill_depth`` remains for
matrices with genuinely pathological buckets, correctness-tested.

No structural counterpart in the reference (its AXPY hot loop,
/root/reference/src/sparse/kernel.cc:771-800, is a scalar stream); this is
the TPU-native formulation of the same memory-bound SpMV capability.
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

__all__ = ["SellRowLane", "pack_sell_rowlane", "spmv_sell_rowlane"]

_W = 1024
_LANES = 128


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class SellRowLane:
    s_idx: jnp.ndarray  # (n_groups, group*8, 128) int8: c % 128
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32 — sorted ascending
    slab_win: jnp.ndarray  # (n_groups, group) int32
    tile_nonempty: jnp.ndarray  # (n_tiles,) bool
    spill: Optional[CSR]  # tail entries beyond spill_depth (or None)
    spill_packed: Optional[object]  # SellSpmv of the tail (fast path)
    t_pack: Optional["SellRowLane"]  # packed A^T for the VJP fast path
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    lanes_per_row: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})

    @property
    def fill_rate(self) -> float:
        spill_nnz = self.spill.nnz if self.spill is not None else 0
        return (self.nnz - spill_nnz) / max(self.vals.size, 1)


_NATIVE_PACK_LOCK = None  # created lazily (threading import at call time)


def _pack_arrays_native(r, c, v, rows, cols, group, L):
    """Native C++ packer (native/codec.cc: smtpu_rowlane_plan/fill).

    Same outputs as ``_pack_arrays`` (bit-identical — both are stable in
    the original entry order); ~20 large numpy temporaries collapse into
    one persistent sort buffer, which matters on hosts where first-touch
    page faults dominate (measured 408 s numpy → seconds native at
    16.6 M nnz).  Returns None when the library is unavailable.
    """
    global _NATIVE_PACK_LOCK
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if (lib is None or not hasattr(lib, "smtpu_rowlane_plan")
            or rows >= 2**31 or cols >= 2**31 or r.size >= 2**31):
        return None
    import ctypes
    import threading

    if _NATIVE_PACK_LOCK is None:
        _NATIVE_PACK_LOCK = threading.Lock()

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    r32 = np.ascontiguousarray(r, np.int32)
    c32 = np.ascontiguousarray(c, np.int32)
    vv = np.ascontiguousarray(v)
    meta = np.zeros(6, np.int64)
    with _NATIVE_PACK_LOCK:
        rc = lib.smtpu_rowlane_plan(
            p32(r32), p32(c32), r32.size, rows, cols, group or 0, L,
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc != 0:
            return None
        total_slots, n_groups, g_sel, n_tiles, n_win, _ = map(int, meta)
        s_idx = np.zeros((total_slots, 8, _LANES), np.int8)
        vals = np.zeros((total_slots, 8, _LANES), vv.dtype)
        win = np.zeros(total_slots, np.int32)
        group_tile = np.zeros(n_groups, np.int32)
        tne = np.zeros(n_tiles, np.uint8)
        rc = lib.smtpu_rowlane_fill(
            p32(r32), p32(c32), p8(vv.view(np.uint8)), vv.dtype.itemsize,
            s_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            p8(vals.view(np.uint8)), p32(win), p32(group_tile), p8(tne),
        )
        if rc != 0:
            return None
    return dict(
        s_idx=s_idx.reshape(n_groups, g_sel * 8, _LANES),
        vals=vals.reshape(n_groups, g_sel * 8, _LANES),
        group_tile=group_tile,
        slab_win=win.reshape(n_groups, g_sel),
        tile_nonempty=tne.astype(bool),
        n_tiles=n_tiles, n_win=n_win, group=g_sel,
    )


def _pack_arrays(r, c, v, rows, cols, group, L, dtype):
    """Vectorized slab assignment; returns the device arrays."""
    T = _LANES // L
    n_tiles = -(-rows // T)
    n_win = max(-(-cols // _W), 1)
    if r.size == 0:
        group = group or 8
        return dict(
            s_idx=np.zeros((1, group * 8, _LANES), np.int8),
            vals=np.zeros((1, group * 8, _LANES), dtype),
            group_tile=np.zeros((1,), np.int64),
            slab_win=np.zeros((1, group), np.int64),
            tile_nonempty=np.zeros((n_tiles,), bool),
            n_tiles=n_tiles, n_win=n_win, group=group,
        )
    t = r // T
    rloc = r % T
    w = c // _W
    u = (c % _W) // _LANES
    sidx = c % _LANES
    # occurrence index d within bucket (t, w, u, rloc)
    key = (((t * n_win + w) * 8 + u) * T + rloc).astype(np.int64)
    order = np.argsort(key, kind="stable")
    ko = key[order]
    new = np.empty(len(ko), bool)
    new[0] = True
    new[1:] = ko[1:] != ko[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(ko)), 0))
    d = np.arange(len(ko)) - run_start
    tt, ww, uu = t[order], w[order], u[order]
    rr, ss, vv = rloc[order], sidx[order], v[order]
    m = d % L
    s = d // L  # slab index within (t, w)
    lane = rr + m * T
    # slab identity (t, w, s) → contiguous ids, sorted t-major
    d_span = int(s.max()) + 1
    skey = (tt * n_win + ww) * d_span + s
    uskey, inv = np.unique(skey, return_inverse=True)
    slab_t = uskey // (n_win * d_span)
    slab_w = (uskey // d_span) % n_win
    n_slabs = len(uskey)
    counts = np.bincount(slab_t, minlength=n_tiles)
    if group is None:
        # auto: biggest per-step batch (amortizes the ~300 ns grid-step
        # cost, measured DMA-bound beyond ~32) whose per-tile padding
        # waste stays under 15%; programs with ~1 slab per tile (e.g.
        # clustered SpGEMM pair matrices) need the small-group tail or
        # per-tile padding dominates fill
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

    s_idx_arr = np.zeros((total_slots, 8, _LANES), np.int8)
    vals_arr = np.zeros((total_slots, 8, _LANES), dtype)
    win = np.zeros(total_slots, np.int64)
    entry_slot = slab_slot[inv]
    s_idx_arr[entry_slot, uu, lane] = ss
    vals_arr[entry_slot, uu, lane] = vv
    win[slab_slot] = slab_w
    group_tile = np.repeat(np.arange(n_tiles), tile_groups)
    return dict(
        s_idx=s_idx_arr.reshape(n_groups, group * 8, _LANES),
        vals=vals_arr.reshape(n_groups, group * 8, _LANES),
        group_tile=group_tile,
        slab_win=win.reshape(n_groups, group),
        tile_nonempty=counts > 0,
        n_tiles=n_tiles, n_win=n_win, group=group,
    )


def _spill_mask_native(r, c, rows, cols, L, spill_depth):
    """keep[i] = bucket occurrence of entry i < L*spill_depth, via the
    native sorter (native/codec.cc: smtpu_rowlane_spill_mask).  Returns
    None when the library is unavailable (numpy fallback in the caller).
    """
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if (lib is None or not hasattr(lib, "smtpu_rowlane_spill_mask")
            or rows >= 2**31 or cols >= 2**31 or r.size >= 2**31):
        return None
    import ctypes

    r32 = np.ascontiguousarray(r, np.int32)
    c32 = np.ascontiguousarray(c, np.int32)
    keep = np.zeros(r32.size, np.uint8)
    rc = lib.smtpu_rowlane_spill_mask(
        r32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        c32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        r32.size, rows, cols, L, L * spill_depth,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return keep.astype(bool)


def pack_sell_rowlane(csr: CSR, group: int | None = None,
                      lanes_per_row: int = 1,
                      spill_depth: int | None = None,
                      with_transpose: bool = False,
                      dtype=None) -> SellRowLane:
    """Pack CSR into row-lane slabs.

    ``lanes_per_row`` L ∈ {1, 2, 4, 8}: lane slots per row (tile shrinks to
    128/L rows, collision depth shrinks ~L×).  ``spill_depth``: entries
    whose bucket occurrence ≥ L*spill_depth go to a masked-slab tail —
    caps slab count at spill_depth per (tile, window), rescuing fill when
    a few heavy buckets would otherwise stretch every slab.
    ``with_transpose`` also packs A^T so the custom VJP's backward pass
    runs on the fast kernel.  ``dtype=jnp.bfloat16`` stores values in bf16
    (halves the dominant HBM traffic; accumulation stays fp32).
    """
    L = lanes_per_row
    if L not in (1, 2, 4, 8):
        raise ValueError("lanes_per_row must be 1/2/4/8")
    sp = csr.to_scipy().tocoo()
    rows, cols = sp.shape
    r = sp.row.astype(np.int64)
    c = sp.col.astype(np.int64)
    v = sp.data
    spill = None
    spill_packed = None
    if spill_depth is not None and r.size:
        keep = _spill_mask_native(r, c, rows, cols, L, spill_depth)
        if keep is None:
            # numpy fallback: recompute occurrence index to find the tail
            T = _LANES // L
            key = ((((r // T) * max(-(-cols // _W), 1) + c // _W) * 8
                    + (c % _W) // _LANES) * T + r % T)
            order = np.argsort(key, kind="stable")
            ko = key[order]
            new = np.empty(len(ko), bool)
            new[0] = True
            new[1:] = ko[1:] != ko[:-1]
            run_start = np.maximum.accumulate(
                np.where(new, np.arange(len(ko)), 0))
            d = np.arange(len(ko)) - run_start
            keep = np.zeros(len(r), bool)
            keep[order] = d < L * spill_depth
        if not keep.all():
            import scipy.sparse as sps

            tail = sps.coo_matrix(
                (v[~keep], (r[~keep], c[~keep])), shape=(rows, cols)
            )
            spill = CSR.from_scipy(tail.tocsr())
            # the tail must NOT fall back to XLA gathers on the hot path
            # (measured: 2% tail via XLA = 410 µs, dwarfing the kernel);
            # recurse: the tail is itself a sparse matrix whose buckets
            # are now shallow, so a second row-lane pack runs it on the
            # same kernel (beats the round-1 masked-slab tail, whose
            # ~4%-full slabs cost 10x the fill saving).  group=None: the
            # tail is far sparser than the body, so it must pick its own
            # (smaller) per-step batch or padding wrecks its fill
            spill_packed = pack_sell_rowlane(
                spill, group=None, lanes_per_row=L, spill_depth=None,
                with_transpose=False, dtype=dtype,
            )
            r, c, v = r[keep], c[keep], v[keep]
    arrs = None
    if r.size:
        arrs = _pack_arrays_native(r, c, v, rows, cols, group, L)
    if arrs is None:
        arrs = _pack_arrays(r, c, v, rows, cols, group, L, v.dtype)
    t_pack = None
    if with_transpose:
        t_pack = pack_sell_rowlane(
            CSR.from_scipy(csr.to_scipy().T.tocsr()), group=group,
            lanes_per_row=L, spill_depth=spill_depth, with_transpose=False,
            dtype=dtype,
        )
    vals_np = arrs["vals"]
    return SellRowLane(
        s_idx=jnp.asarray(arrs["s_idx"], jnp.int8),
        vals=(jnp.asarray(vals_np) if dtype is None
              else jnp.asarray(vals_np).astype(dtype)),
        group_tile=jnp.asarray(arrs["group_tile"], jnp.int32),
        slab_win=jnp.asarray(arrs["slab_win"], jnp.int32),
        tile_nonempty=jnp.asarray(arrs["tile_nonempty"]),
        spill=spill,
        spill_packed=spill_packed,
        t_pack=t_pack,
        shape=(rows, cols),
        n_tiles=arrs["n_tiles"],
        n_win=arrs["n_win"],
        group=arrs["group"],
        lanes_per_row=L,
        nnz=csr.nnz,
    )


# gather-index dtype on the hot path: int8 feeds dynamic_gather directly
# (probe-confirmed on Mosaic); flip to benchmark the astype(int32) unpack
IDX_INT32_UNPACK = False


def _rowlane_kernel(tile_ref, win_ref, sidx_ref, vals_ref, x_ref, o_ref, *,
                    group: int, idx_unpack: bool = False):
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        sidx = sidx_ref[0, b * 8 : (b + 1) * 8, :]
        if idx_unpack:
            sidx = sidx.astype(jnp.int32)
        gth = jnp.take_along_axis(xw, sidx, axis=1)  # legal (8,128) gather
        acc = acc + vals_ref[0, b * 8 : (b + 1) * 8, :] * gth
    # lane l already IS the row slot → one sublane sum closes the step
    part = jnp.sum(acc, axis=0, keepdims=True)  # (1, 128)
    o_ref[0:1, :] = o_ref[0:1, :] + part.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "interpret",
                                             "idx_unpack"))
def _rowlane_call(group_tile, slab_win, s_idx, vals, xp, *, group, n_tiles,
                  interpret=False, idx_unpack=False):
    n_groups = s_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
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
        functools.partial(_rowlane_kernel, group=group,
                          idx_unpack=idx_unpack),
        grid_spec=grid_spec,
        # accumulate and emit fp32 even for bf16-stored values
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, slab_win.reshape(-1), s_idx, vals, xp)


# scalar-prefetch metadata lives in SMEM (~1 MB); chunk calls so
# group_tile + slab_win stay well under it.  slab_win is (groups, group)
# int32, so the per-call group budget shrinks with the group size
# (group=8 → 24k groups/call as before; group=256 → 780).
_SMEM_PREFETCH_BUDGET = 800_000  # bytes


def _max_groups_per_call(group: int) -> int:
    return max(1, _SMEM_PREFETCH_BUDGET // (4 * (group + 1)))


def _rowlane_forward(packed: SellRowLane, x):
    rows, cols = packed.shape
    L = packed.lanes_per_row
    T = _LANES // L
    S = packed.n_win * 8
    xp = jnp.zeros((S * _LANES,), x.dtype).at[:cols].set(x).reshape(S, _LANES)
    n_groups = packed.s_idx.shape[0]
    y = jnp.zeros((packed.n_tiles, T), jnp.float32)
    chunk = _max_groups_per_call(packed.group)
    for g0 in range(0, n_groups, chunk):
        g1 = min(g0 + chunk, n_groups)
        out = _rowlane_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.s_idx[g0:g1], packed.vals[g0:g1], xp,
            group=packed.group, n_tiles=packed.n_tiles,
            interpret=config.interpret(), idx_unpack=IDX_INT32_UNPACK,
        )
        # sublane 0 of each (8,128) tile holds per-lane sums; fold the L
        # lane replicas of each row
        out = out.reshape(packed.n_tiles, 8, _LANES)[:, 0, :]
        out = out.reshape(packed.n_tiles, L, T).sum(axis=1)
        touched = (
            jnp.zeros(packed.n_tiles, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        y = y + jnp.where(touched[:, None], out, 0)
    y = y.reshape(packed.n_tiles * T)[:rows]
    if packed.spill_packed is not None:
        if isinstance(packed.spill_packed, SellRowLane):
            y = y + _rowlane_forward(packed.spill_packed, x)
        else:  # legacy containers packed with the masked-slab kernel
            from .spmv_pallas import spmv_sell

            y = y + spmv_sell(packed.spill_packed, x)
    elif packed.spill is not None:
        from ..ops.spmv import spmv_reference

        y = y + spmv_reference(packed.spill, x)
    return y


def _rowlane_matvec_t_jnp(packed: SellRowLane, g):
    """``A^T @ g`` from the slab arrays alone (XLA scatter fallback for the
    VJP when no transposed pack was built — correct, not fast)."""
    L = packed.lanes_per_row
    T = _LANES // L
    n_groups, GH, _ = packed.s_idx.shape
    group = packed.group
    # reconstruct per-slot (row, col): lane→row, (win, sublane, s_idx)→col
    lane = jnp.arange(_LANES)[None, None, :]
    rloc = lane % T
    row = packed.group_tile[:, None, None] * T + rloc  # (n_groups, 1, 128)
    subl = (jnp.arange(GH) % 8)[None, :, None]
    winb = jnp.repeat(packed.slab_win, 8, axis=1)[:, :, None]  # (n_groups, GH, 1)
    col = winb * _W + subl * _LANES + packed.s_idx.astype(jnp.int32)
    gv = g[jnp.broadcast_to(row, col.shape)] * packed.vals
    cols = packed.shape[1]
    out = jnp.zeros((cols,), packed.vals.dtype)
    out = out.at[col.reshape(-1)].add(gv.reshape(-1))
    return out


@jax.custom_vjp
def spmv_sell_rowlane(packed: SellRowLane, x):
    """``y = A @ x`` via the row-lane slab layout (differentiable in x)."""
    return _rowlane_forward(packed, x)


def _rowlane_fwd(packed, x):
    return _rowlane_forward(packed, x), (packed, x)


def _rowlane_bwd(res, g):
    packed, x = res
    if packed.t_pack is not None:
        gx = _rowlane_forward(packed.t_pack, g)
    else:
        gx = _rowlane_matvec_t_jnp(packed, g)
        if packed.spill is not None:
            # spill is tiny; its transpose product via COO scatter
            sp = packed.spill
            rid = sp._row_ids_or_compute()
            contrib = sp.data * g[jnp.clip(rid, 0, g.shape[0] - 1)]
            gx = gx + jnp.zeros_like(gx).at[sp.indices].add(contrib)
    # cotangent for the packed container: only vals gets one (gather x at
    # each slot, scale by g at the slot's row); integer/bool leaves get
    # float0 zeros as custom_vjp requires
    L = packed.lanes_per_row
    T = _LANES // L
    n_groups, GH, _ = packed.s_idx.shape
    lane = jnp.arange(_LANES)[None, None, :]
    row = packed.group_tile[:, None, None] * T + (lane % T)
    subl = (jnp.arange(GH) % 8)[None, :, None]
    winb = jnp.repeat(packed.slab_win, 8, axis=1)[:, :, None]
    col = winb * _W + subl * _LANES + packed.s_idx.astype(jnp.int32)
    rows, cols = packed.shape
    xpad = jnp.zeros((packed.n_win * _W,), x.dtype).at[:cols].set(x)
    gpad = jnp.zeros((packed.n_tiles * T,), g.dtype).at[:rows].set(g)
    mask = packed.vals != 0  # padding slots carry no gradient
    dvals = jnp.where(
        mask, xpad[col] * gpad[jnp.broadcast_to(row, col.shape)], 0
    ).astype(packed.vals.dtype)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(dpacked, vals=dvals)
    return dpacked, gx


spmv_sell_rowlane.defvjp(_rowlane_fwd, _rowlane_bwd)
