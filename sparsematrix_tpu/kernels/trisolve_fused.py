"""Fused triangular solve — ALL levels in ONE pallas call.

``trisolve_level_apply`` (ops/trisolve.py) scans a row-lane kernel call
per dependency level; measured on TPU the per-call dispatch dominates for
deep level structures (ILU(0) of a 64×64 Poisson system has 127 levels —
25 CG iterations spent 46 ms in ~6300 tiny pallas calls).  This kernel
exploits that a TPU grid executes its steps *sequentially*: the whole
solve is one ``pallas_call`` whose grid walks the levels in dependency
order while x stays resident in VMEM (the output block, revisited by
every step, is the running solution vector).

Layout (square n×n, lanes_per_row=1): x/b live as (S, 128) where element
i sits at (sublane i//128, lane i%128) — simultaneously the row-lane
kernel's *window* view of x (8-sublane windows of 128-column chunks) and
a *tile* view of the solution (tile t's 128 rows are exactly sublane t).
A grid step processes ``group`` slabs of one (level, tile) segment:

  * gather/fma exactly as in ``spmv_rowlane`` (axis-1 (8,128)
    ``take_along_axis``), reading x from the output block — rows of
    earlier levels are already final because the grid is sequential;
  * a per-segment VMEM accumulator collects partial sums across the
    segment's groups;
  * the segment's last group **commits**: one sublane-sum closes the
    per-row dot products, and the aligned 8-sublane block holding tile t
    is rewritten with ``x[r] = (b[r] - Σ E x)·inv_diag[r]`` selected into
    lane positions by a per-segment gate mask (rows of other levels in
    the same tile keep their value).

No reference counterpart (the reference has no triangular solves); this
is the TPU-native answer to cuSPARSE-style analysis+solve: plan once on
the host, solve as a single device kernel with work ∝ nnz.
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

__all__ = ["TriFusedPlan", "trisolve_fused_plan", "trisolve_fused_apply",
           "trisolve_fused_apply_batched"]

_LANES = 128
_W = 1024


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class TriFusedPlan:
    """Level-ordered slab program for the single-call solve."""

    s_idx: jnp.ndarray  # (n_groups, group*8, 128) int8
    vals: jnp.ndarray  # (n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_groups,) int32
    slab_win: jnp.ndarray  # (n_groups*group,) int32
    seg_id: jnp.ndarray  # (n_groups,) int32 — (level, tile) segment
    seg_first: jnp.ndarray  # (n_groups,) int32 0/1
    commit: jnp.ndarray  # (n_groups,) int32 0/1 — last group of segment
    aux: jnp.ndarray  # (n_segs, 8, 128): sublane 0 gate, 1 gate*inv_diag
    inv_diag: jnp.ndarray  # (n,) — in PERMUTED order when perm is set
    t_plan: Optional["TriFusedPlan"]  # plan of A^T for the solve VJP
    perm: Optional[jnp.ndarray]  # (n,) new→old (level sort), or None
    rank: Optional[jnp.ndarray]  # (n,) old→new inverse, or None
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    lower: bool = dataclasses.field(metadata={"static": True})
    unit_diagonal: bool = dataclasses.field(metadata={"static": True})
    n_levels: int = dataclasses.field(metadata={"static": True})


def trisolve_fused_plan(A: CSR, lower: bool = True,
                        unit_diagonal: bool = False,
                        group: int | None = None,
                        with_transpose: bool = False,
                        level_sort: bool = True,
                        dtype=None) -> TriFusedPlan:
    """Stratify rows into levels, pack each level's off-diagonal entries
    row-lane (group=1), and splice the slabs into one level-ordered
    program with per-(level, tile) commit points.

    ``group`` batches slabs per grid step (auto: largest of 8/4/2/1 whose
    segment padding stays under 15%).  ``dtype=jnp.bfloat16`` stores
    values bf16 (fp32 accumulation).

    The whole plan is ONE vectorized numpy pass: the level is simply an
    extra major key in the slab bucket (level, tile, window, sublane,
    lane), so stratification costs no more than a plain row-lane pack —
    the per-level-pack formulation measured 79 s for a 127-level ILU
    factor where this takes milliseconds.
    """
    from ..ops.trisolve import _compute_levels

    sp = A.to_scipy().tocsr()
    sp.sort_indices()
    n = sp.shape[0]
    if sp.shape[0] != sp.shape[1]:
        raise ValueError("trisolve needs a square matrix")
    indptr, indices, data = sp.indptr.astype(np.int64), sp.indices, sp.data
    rid = np.repeat(np.arange(n), np.diff(indptr))
    offd = (indices < rid) if lower else (indices > rid)
    diag_mask = indices == rid

    inv_d = np.ones(n, dtype=np.float32)
    if not unit_diagonal:
        drows = rid[diag_mask]
        dv = data[diag_mask]
        if len(drows) < n or (dv == 0).any():
            missing = np.setdiff1d(np.arange(n), drows)
            bad = (missing[0] if len(missing)
                   else drows[np.nonzero(dv == 0)[0][0]])
            raise ValueError(f"zero/missing diagonal at row {bad}")
        inv_d[drows] = 1.0 / dv

    level = _compute_levels(n, rid[offd], indices[offd].astype(np.int64))
    n_levels = int(level.max()) + 1 if n else 1
    n_win = max(-(-n // _W), 1)
    vdtype = np.float32 if dtype is None else np.dtype(jnp.bfloat16
                                                      if dtype == jnp.bfloat16
                                                      else dtype)

    er, ec, ev = rid[offd].astype(np.int64), indices[offd].astype(np.int64), data[offd]

    perm = rank = None
    if level_sort and n:
        # topological (level-major, original-index-minor) symmetric
        # permutation: every 128-row tile then spans ~1 level, so the
        # segment count collapses from Σ_j tiles(j) to ~n_tiles+n_levels
        # (the Poisson ILU factors: 2 265 → ~160 grid steps).  A stable
        # level sort is a topological order, so PAPᵀ stays triangular
        # and the solve is the same system in permuted coordinates.
        perm = np.argsort(level, kind="stable")  # new → old
        rank = np.empty(n, np.int64)  # old → new
        rank[perm] = np.arange(n)
        er, ec = rank[er], rank[ec]
        inv_d = inv_d[perm]
        level = level[perm]

    elvl = level[er]  # ≥ 1 by construction (level-0 rows have no deps)
    n_tiles = -(-n // _LANES)

    if er.size == 0:
        idt = jnp.int32
        return TriFusedPlan(
            s_idx=jnp.zeros((0, 8, _LANES), jnp.int8),
            vals=jnp.zeros((0, 8, _LANES), vdtype),
            group_tile=jnp.zeros((0,), idt),
            slab_win=jnp.zeros((0,), idt),
            seg_id=jnp.zeros((0,), idt),
            seg_first=jnp.zeros((0,), idt),
            commit=jnp.zeros((0,), idt),
            aux=jnp.zeros((0, 8, _LANES), jnp.float32),
            inv_diag=jnp.asarray(inv_d),
            t_plan=None,
            perm=None,
            rank=None,
            shape=(n, n), group=1, n_win=n_win,
            lower=lower, unit_diagonal=unit_diagonal, n_levels=n_levels,
        )

    # slab bucketing with the level as the major key — one sorted pass
    t = er // _LANES
    lane = er % _LANES
    w = ec // _W
    u = (ec % _W) // _LANES
    sidx_e = ec % _LANES
    bucket = (((elvl * n_tiles + t) * n_win + w) * 8 + u) * _LANES + lane
    order = np.argsort(bucket, kind="stable")
    bo = bucket[order]
    new = np.empty(len(bo), bool)
    new[0] = True
    new[1:] = bo[1:] != bo[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(bo)), 0))
    d = np.arange(len(bo)) - run_start  # occurrence → slab within (j,t,w)
    d_span = int(d.max()) + 1
    jt = (elvl * n_tiles + t)[order]  # segment key (level-major, tile minor)
    slab_key = (jt * n_win + w[order]) * d_span + d
    uslab, inv = np.unique(slab_key, return_inverse=True)
    # guard: highly scattered patterns (many levels × many windows, ~1
    # entry per slab) can blow the padded layout up to GBs — that regime
    # belongs to trisolve_fixpoint_plan (nilpotent-Jacobi SpMV), not here
    est_bytes = len(uslab) * 8 * _LANES * (1 + np.dtype(vdtype).itemsize)
    if est_bytes > 2 << 30:
        raise ValueError(
            f"trisolve_fused_plan: slab layout would need ~{est_bytes >> 20}"
            f" MB ({len(uslab)} slabs for {er.size} entries); the pattern "
            "is too scattered for the fused layout — use "
            "trisolve_fixpoint_plan instead")
    slab_seg = uslab // (n_win * d_span)  # == j*n_tiles + t, sorted
    slab_w = (uslab // d_span) % n_win
    useg, seg_start = np.unique(slab_seg, return_index=True)
    n_segs = len(useg)
    sizes = np.diff(np.r_[seg_start, len(uslab)])

    if group is None:
        group = 1
        total = sizes.sum()
        for g in (8, 4, 2):
            waste = ((-(-sizes // g) * g).sum() - total) / max(total, 1)
            if waste <= 0.15:
                group = g
                break

    # pad each segment to a multiple of `group` with zero slabs (repeat
    # the segment's last window id so gathers stay in range)
    seg_groups = -(-sizes // group)
    padded = seg_groups * group
    seg_offset = np.concatenate([[0], np.cumsum(padded)])
    rank_in_seg = np.arange(len(uslab)) - seg_start[
        np.searchsorted(useg, slab_seg)]
    seg_of_slab = np.searchsorted(useg, slab_seg)
    slab_slot = seg_offset[seg_of_slab] + rank_in_seg
    total_slots = int(seg_offset[-1])

    vnp = np.float32 if dtype is None else vdtype
    s_idx = np.zeros((total_slots, 8, _LANES), np.int8)
    vals = np.zeros((total_slots, 8, _LANES), vnp)
    slab_win = np.zeros(total_slots, np.int32)
    entry_slot = slab_slot[inv]
    s_idx[entry_slot, u[order], lane[order]] = sidx_e[order]
    vals[entry_slot, u[order], lane[order]] = ev[order]
    slab_win[slab_slot] = slab_w
    # padding slots: repeat each segment's last real window id
    last_w = slab_w[seg_start + sizes - 1].astype(np.int32)
    pad_mask = np.ones(total_slots, bool)
    pad_mask[slab_slot] = False
    pad_seg = np.searchsorted(seg_offset[1:], np.nonzero(pad_mask)[0],
                              side="right")
    slab_win[pad_mask] = last_w[pad_seg]

    s_idx = s_idx.reshape(-1, group * 8, _LANES)
    vals = vals.reshape(-1, group * 8, _LANES)

    seg_tile_arr = (useg % n_tiles).astype(np.int64)
    seg_level_arr = (useg // n_tiles).astype(np.int64)
    gt = np.repeat(seg_tile_arr, seg_groups)
    sid = np.repeat(np.arange(n_segs), seg_groups)
    pos = np.arange(len(sid)) - np.concatenate(
        [[0], np.cumsum(seg_groups)])[sid]
    sfirst = (pos == 0).astype(np.int32)
    scommit = (pos == seg_groups[sid] - 1).astype(np.int32)

    # per-segment gate masks over the tile's 128 rows
    aux = np.zeros((n_segs, 8, _LANES), np.float32)
    lev_pad = np.full(n_tiles * _LANES, -1, np.int64)
    lev_pad[:n] = level
    inv_pad = np.zeros(lev_pad.shape, np.float32)
    inv_pad[:n] = inv_d
    lev2d = lev_pad.reshape(n_tiles, _LANES)
    inv2d = inv_pad.reshape(n_tiles, _LANES)
    gate = (lev2d[seg_tile_arr] == seg_level_arr[:, None]).astype(np.float32)
    aux[:, 0] = gate
    aux[:, 1] = gate * inv2d[seg_tile_arr]

    idt = jnp.int32
    t_plan = None
    if with_transpose:
        import scipy.sparse as sps

        At = CSR.from_scipy(sps.csr_matrix(A.to_scipy().T))
        t_plan = trisolve_fused_plan(At, lower=not lower,
                                     unit_diagonal=unit_diagonal,
                                     group=group, with_transpose=False,
                                     level_sort=level_sort, dtype=dtype)
    return TriFusedPlan(
        s_idx=jnp.asarray(s_idx, jnp.int8),
        vals=jnp.asarray(vals, vdtype),
        group_tile=jnp.asarray(np.asarray(gt), idt),
        slab_win=jnp.asarray(slab_win, idt),
        seg_id=jnp.asarray(np.asarray(sid), idt),
        seg_first=jnp.asarray(np.asarray(sfirst), idt),
        commit=jnp.asarray(np.asarray(scommit), idt),
        aux=jnp.asarray(aux),
        inv_diag=jnp.asarray(inv_d),
        t_plan=t_plan,
        perm=None if perm is None else jnp.asarray(perm, jnp.int32),
        rank=None if rank is None else jnp.asarray(rank, jnp.int32),
        shape=(n, n), group=int(group), n_win=n_win,
        lower=lower, unit_diagonal=unit_diagonal, n_levels=n_levels,
    )


def _fused_kernel(tile_ref, win_ref, segf_ref, com_ref, seg_ref, sidx_ref,
                  vals_ref, aux_ref, binv_ref, o_ref, acc_ref, *,
                  group: int):
    del seg_ref  # consumed by the aux BlockSpec index map
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = binv_ref[:]

    @pl.when(segf_ref[g] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        w = win_ref[g * group + b]
        xw = o_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        sidx = sidx_ref[0, b * 8 : (b + 1) * 8, :]
        gth = jnp.take_along_axis(xw, sidx, axis=1)
        acc = acc + vals_ref[0, b * 8 : (b + 1) * 8, :].astype(jnp.float32) * gth
    acc_ref[:] = acc_ref[:] + acc

    @pl.when(com_ref[g] == 1)
    def _():
        t = tile_ref[g]
        part = jnp.sum(acc_ref[:], axis=0, keepdims=True)  # (1, 128)
        gate = aux_ref[0, 0:1, :]
        ginv = aux_ref[0, 1:2, :]
        base = pl.multiple_of((t // 8) * 8, 8)
        xb = o_ref[pl.ds(base, 8), :]
        bb = binv_ref[pl.ds(base, 8), :]
        cand = xb + gate * (bb - xb) - part * ginv
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        o_ref[pl.ds(base, 8), :] = jnp.where(sub == t % 8, cand, xb)


@functools.partial(jax.jit, static_argnames=("group", "n_win", "interpret"))
def _fused_call(group_tile, slab_win, seg_first, commit, seg_id, s_idx, vals,
                aux, binv, *, group, n_win, interpret=False):
    n_groups = s_idx.shape[0]
    S = n_win * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, t, w, sf, cm, sg: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, t, w, sf, cm, sg: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _LANES),
                         lambda g, t, w, sf, cm, sg: (sg[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # binv (S, 128)
        ],
        out_specs=pl.BlockSpec((S, _LANES),
                               lambda g, t, w, sf, cm, sg: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fused_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, slab_win, seg_first, commit, seg_id, s_idx, vals, aux,
      binv)


def _fused_forward(plan: TriFusedPlan, b):
    n = plan.shape[0]
    if plan.perm is not None:
        b = b[plan.perm]  # into the level-sorted coordinates
    x0 = plan.inv_diag * b
    if plan.s_idx.shape[0] == 0:
        x = x0
    else:
        S = plan.n_win * 8
        binv = (jnp.zeros((S * _LANES,), jnp.float32).at[:n].set(x0)
                .reshape(S, _LANES))
        out = _fused_call(
            plan.group_tile, plan.slab_win, plan.seg_first, plan.commit,
            plan.seg_id, plan.s_idx, plan.vals, plan.aux, binv,
            group=plan.group, n_win=plan.n_win,
            interpret=config.interpret(),
        )
        x = out.reshape(-1)[:n]
    if plan.perm is not None:
        x = x[plan.rank]  # back to the caller's coordinates
    return x


@jax.custom_vjp
def trisolve_fused_apply(plan: TriFusedPlan, b):
    """Device solve: ONE pallas call for all levels (jittable).

    Differentiable in ``b`` and ``plan.vals`` when the plan was built
    with ``with_transpose=True``: for ``x = T⁻¹ b``, the cotangents are
    ``ḡ_b = T⁻ᵀ g`` (a fused solve on the transposed plan) and
    ``ḡ_vals[slot (r,c)] = −(T⁻ᵀ g)_r · x_c`` at the stored slots.
    """
    return _fused_forward(plan, b)


def _fused_vjp_fwd(plan, b):
    x = _fused_forward(plan, b)
    return x, (plan, x)


def _fused_vjp_bwd(res, g):
    plan, x = res
    if plan.s_idx.shape[0] == 0:
        # diagonal solve is self-transpose (in any symmetric permutation)
        gb = _fused_forward(plan, g)
        dpacked = jax.tree_util.tree_map(_ct_zero, plan)
        return dpacked, gb
    if plan.t_plan is None:
        raise ValueError(
            "trisolve_fused_apply backward pass needs the transposed plan "
            "— build with trisolve_fused_plan(..., with_transpose=True)")
    gbar = _fused_forward(plan.t_plan, g)  # T^{-T} g, caller coordinates
    if plan.perm is not None:
        # slot coordinates below live in the plan's level-sorted space
        x = x[plan.perm]
        gbar_p = gbar[plan.perm]
    else:
        gbar_p = gbar
    # slot coordinates: lane→row within the group's tile, (win,u,sidx)→col
    n_groups, GH, _ = plan.s_idx.shape
    group = plan.group
    lane = jnp.arange(_LANES)[None, None, :]
    row = plan.group_tile[:, None, None] * _LANES + lane
    subl = (jnp.arange(GH) % 8)[None, :, None]
    winb = jnp.repeat(plan.slab_win.reshape(n_groups, group), 8,
                      axis=1)[:, :, None]
    col = winb * _W + subl * _LANES + plan.s_idx.astype(jnp.int32)
    n = plan.shape[0]
    pad = plan.n_win * _W
    gpad = jnp.zeros((pad,), jnp.float32).at[:n].set(gbar_p)
    xpad = jnp.zeros((pad,), jnp.float32).at[:n].set(x)
    mask = plan.vals != 0
    dvals = jnp.where(
        mask, -gpad[jnp.broadcast_to(row, col.shape)] * xpad[col], 0
    ).astype(plan.vals.dtype)
    dpacked = jax.tree_util.tree_map(_ct_zero, plan)
    dpacked = dataclasses.replace(dpacked, vals=dvals)
    return dpacked, gbar


def _ct_zero(p):
    if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
        return jnp.zeros_like(p)
    return np.zeros(jnp.shape(p), jax.dtypes.float0)


trisolve_fused_apply.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def trisolve_fused_apply_batched(plan: TriFusedPlan, B):
    """Multi-RHS solve ``X = T⁻¹ B`` for B of shape (n, k).

    Sequential ``lax.scan`` over the k right-hand sides — each is one
    fused kernel call, so total device work is k × the single solve (a
    lane-batched kernel would need a different x layout; at the typical
    preconditioner k ≤ 32 the scan is within ~2× of that bound).
    Differentiable like the single-RHS solve.
    """
    if B.ndim == 1:
        return trisolve_fused_apply(plan, B)

    def step(_, b_col):
        return None, trisolve_fused_apply(plan, b_col)

    _, cols = jax.lax.scan(step, None, B.T)
    return cols.T
