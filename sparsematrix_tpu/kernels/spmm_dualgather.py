"""Dual-gather SpMM — the dual-gather SpMV layout walked per RHS column.

The low-density multi-RHS gap (d below the densify threshold, k ≤ 64):
``spmm_rowlane`` walks the row-lane slabs once per column; this walks the
DUAL-GATHER slabs instead — the same two-gather sequence as
``spmv_dualgather`` (chunk-select on axis 0, lane-route on axis 1), so
the multi-RHS path inherits the round-3 layout's ~2× fill advantage
(0.46 vs 0.23 → about half the slab bytes per nnz·k MAC).

Reuses k_tiles=1 ``DualGather`` packs (per-tile grid, padding groups
repeat the last tile id with zero values).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from .spmv_dualgather import _LANES, DualGather, _max_groups_per_call

__all__ = ["spmm_dualgather"]


_KP_SB = 8  # columns per superblock panel (acc scratch: kp × (k_tiles,128))


def _dg_sb_mm_kernel(super_ref, win_ref, tloc_ref, commit_ref, idxA_ref,
                     idxB_ref, vals_ref, xt_ref, o_ref, acc_ref, *,
                     group: int, k_tiles: int, kp: int, nibble: bool,
                     two_win: bool):
    """Superblock multi-RHS walk: the SpMV superblock kernel's exact slab
    walk, re-run per RHS column via a ``fori_loop`` over the panel (slabs
    stay UNROLLED inside — program size matches the SpMV kernel, the
    per-column re-loads of idx/vals are plain VMEM reads).  Per column a
    single (k_tiles, 128) register accumulator takes the masked adds; one
    dynamic-row RMW into the (kp, k_tiles, 128) scratch per (group,
    column) — amortized over the whole group, NOT the serializing
    per-slab RMW probe_dualgather_xl5 measured."""
    g = pl.program_id(1)

    @pl.when(jnp.logical_or(g == 0, super_ref[g] != super_ref[g - 1]))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sub = jax.lax.broadcasted_iota(jnp.int32, (k_tiles, _LANES), 0)

    def col(j, carry):
        acc = jnp.zeros((k_tiles, _LANES), jnp.float32)
        for b in range(group):
            w = win_ref[g * group + b]
            if nibble:
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
                xa = xt_ref[j, pl.ds(pl.multiple_of(wa * 8, 8), 8), :]
                xb = xt_ref[j, pl.ds(pl.multiple_of(wb * 8, 8), 8), :]
                ch = jnp.bitwise_and(iA4, 7).astype(jnp.int8)
                t1a = jnp.take_along_axis(xa, ch, axis=0)
                t1b = jnp.take_along_axis(xb, ch, axis=0)
                t1 = jnp.where(iA4 >= 8, t1b, t1a)
            else:
                xw = xt_ref[j, pl.ds(pl.multiple_of(w * 8, 8), 8), :]
                t1 = jnp.take_along_axis(
                    xw, iA4.astype(jnp.int8) if nibble else iA4, axis=0)
            gth = jnp.take_along_axis(t1, iB, axis=1)
            prod = vals_ref[0, b * 8:(b + 1) * 8, :] * gth
            part = jnp.sum(prod, axis=0, keepdims=True)  # (1, 128)
            acc = acc + jnp.where(sub == tloc_ref[g * group + b], part, 0.0)
        acc_ref[pl.ds(j, 1)] = acc_ref[pl.ds(j, 1)] + acc[None]
        return carry

    jax.lax.fori_loop(0, kp, col, 0)

    @pl.when(commit_ref[g] == 1)
    def _():
        for j in range(kp):
            for tl in range(k_tiles):
                o_ref[j, tl * 8:tl * 8 + 1, :] = acc_ref[j, tl:tl + 1, :]


@functools.partial(jax.jit, static_argnames=("group", "k_tiles", "n_super",
                                             "kp", "nibble", "two_win",
                                             "interpret"))
def _dg_sb_mm_call(group_super, slab_win, slab_tloc, commit, idxA, idxB,
                   vals, xt, *, group, k_tiles, n_super, kp,
                   nibble=False, two_win=False, interpret=False):
    n_groups = idxA.shape[0]
    k_pad, S = xt.shape[0], xt.shape[1]
    n_panels = k_pad // kp
    ia_rows = (group // 2 if nibble else group) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_panels, n_groups),
        in_specs=[
            pl.BlockSpec((1, ia_rows, _LANES),
                         lambda p, g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda p, g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda p, g, s, w, t, cm: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, S, _LANES),
                         lambda p, g, s, w, t, cm: (p, 0, 0),
                         memory_space=pltpu.VMEM),  # RHS column panel
        ],
        out_specs=pl.BlockSpec((kp, 8 * k_tiles, _LANES),
                               lambda p, g, s, w, t, cm: (p, s[g], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kp, k_tiles, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_dg_sb_mm_kernel, group=group, k_tiles=k_tiles,
                          kp=kp, nibble=nibble, two_win=two_win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (k_pad, n_super * 8 * k_tiles, _LANES), jnp.float32),
        interpret=interpret,
    )(group_super, slab_win.reshape(-1), slab_tloc.reshape(-1), commit,
      idxA, idxB, vals, xt)


def _spmm_dg_sb_forward(packed: DualGather, X):
    """Multi-RHS walk over a SUPERBLOCK pack (k_tiles>1; nibble and
    two-window layouts included — the XL native packs)."""
    from .spmv_dualgather import _pooled_forward

    rows, cols = packed.shape
    k = X.shape[1]
    S = packed.n_win * 8
    # adaptive panel width: whole RHS resident when it fits VMEM so the
    # slab planes stream once (see spmv_octet spmm note)
    kp = min(k, max(_KP_SB, (6 << 20) // max(S * _LANES * 4, 1)))
    k_pad = -(-k // kp) * kp
    # (k_pad, S, 128): column-major panels of the padded RHS
    Xp = jnp.zeros((S * _LANES, k_pad), X.dtype).at[:cols, :k].set(X)
    xt = Xp.T.reshape(k_pad, S, _LANES)
    kt = packed.k_tiles
    n_super = -(-packed.n_tiles // kt)
    n_groups = packed.idxA.shape[0]
    bounds = [0, *packed.splits, n_groups]
    y = jnp.zeros((packed.n_tiles, k_pad, _LANES), jnp.float32)
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        out = _dg_sb_mm_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.slab_tloc[g0:g1], packed.commit[g0:g1],
            packed.idxA[g0:g1], packed.idxB[g0:g1], packed.vals[g0:g1],
            xt, group=packed.group, k_tiles=kt, n_super=n_super, kp=kp,
            nibble=packed.nibble, two_win=packed.two_win,
            interpret=config.interpret(),
        )
        # sublane 0 of each tile block carries that tile's row sums
        out = out.reshape(k_pad, n_super * kt, 8, _LANES)[:, :, 0, :]
        touched = (
            jnp.zeros(n_super, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        out = out.reshape(k_pad, n_super, kt, _LANES)
        out = jnp.where(touched[None, :, None, None], out, 0)
        out = out.reshape(k_pad, n_super * kt, _LANES)[:, :packed.n_tiles]
        y = y + out.transpose(1, 0, 2)
    y = y.transpose(0, 2, 1).reshape(packed.n_tiles * _LANES, k_pad)
    if packed.tail is not None:
        xp2 = jnp.zeros((S * _LANES,), X.dtype)
        cols_t = []
        for j in range(k):
            xpj = xp2.at[:cols].set(X[:, j]).reshape(S, _LANES)
            cols_t.append(_pooled_forward(packed.tail, xpj).reshape(-1))
        y = y.at[:, :k].add(jnp.stack(cols_t, axis=1)[: y.shape[0]])
    return y[:rows, :k]


_KP = 8  # columns per register panel (8 × (8,128) fp32 accumulators)


def _dg_mm_kernel(tile_ref, win_ref, idxA_ref, idxB_ref, vals_ref, xt_ref,
                  o_ref, *, group: int, k: int, s_rows: int):
    """Round-4 loop structure: the r3 version fori-looped columns with a
    per-column dynamic-row o_ref read-modify-write — the accumulate
    pattern probe_dualgather_xl5 measured serializing the pipeline (the
    whole walk ran ~6× over its op-count estimate).  Columns are now
    processed in UNROLLED panels of _KP with register-carried (8,128)
    accumulators (2 gathers + 1 fma per slab·column, sums deferred to
    panel end) and one o_ref accumulate per (panel, grid step)."""
    g = pl.program_id(0)

    @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for p0 in range(0, k, _KP):
        kp = min(_KP, k - p0)
        acc = [jnp.zeros((8, _LANES), jnp.float32) for _ in range(kp)]
        for b in range(group):
            iA = idxA_ref[0, b * 8:(b + 1) * 8, :]
            iB = idxB_ref[0, b * 8:(b + 1) * 8, :]
            vv = vals_ref[0, b * 8:(b + 1) * 8, :].astype(jnp.float32)
            w = win_ref[g * group + b]
            for j in range(kp):
                xw = xt_ref[pl.ds((p0 + j) * s_rows + w * 8, 8), :]
                t1 = jnp.take_along_axis(xw, iA, axis=0)
                gth = jnp.take_along_axis(t1, iB, axis=1)
                acc[j] = acc[j] + vv * gth
        part = jnp.concatenate(
            [jnp.sum(a, axis=0, keepdims=True) for a in acc], axis=0)
        o_ref[p0:p0 + kp, :] = (o_ref[p0:p0 + kp, :]
                                + part.astype(o_ref.dtype))


@functools.partial(jax.jit, static_argnames=("group", "n_tiles", "k",
                                             "interpret"))
def _dg_mm_call(group_tile, slab_win, idxA, idxB, vals, xt, *, group,
                n_tiles, k, interpret=False):
    n_groups = idxA.shape[0]
    s_rows = xt.shape[0] // k
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X^T panes (k*S, 128)
        ],
        out_specs=pl.BlockSpec((k, _LANES), lambda g, t, w: (t[g], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_dg_mm_kernel, group=group, k=k, s_rows=s_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * k, _LANES), jnp.float32),
        interpret=interpret,
    )(group_tile, slab_win.reshape(-1), idxA, idxB, vals, xt)


def _spmm_dg_forward(packed: DualGather, X):
    if packed.k_tiles > 1:
        return _spmm_dg_sb_forward(packed, X)
    if packed.tail is not None or packed.splits:
        raise ValueError("spmm_dualgather needs a superblock pack or a "
                         "plain k_tiles=1 pack (no tail, no splits)")
    rows, cols = packed.shape
    k = X.shape[1]
    S = packed.n_win * 8
    Xp = jnp.zeros((S * _LANES, k), X.dtype).at[:cols].set(X)
    xt = Xp.T.reshape(k * S, _LANES)
    n_groups = packed.idxA.shape[0]
    chunk = _max_groups_per_call(packed.group)
    y = jnp.zeros((packed.n_tiles, k, _LANES), jnp.float32)
    for g0 in range(0, n_groups, chunk):
        g1 = min(g0 + chunk, n_groups)
        out = _dg_mm_call(
            packed.group_tile[g0:g1], packed.slab_win[g0:g1],
            packed.idxA[g0:g1], packed.idxB[g0:g1], packed.vals[g0:g1],
            xt, group=packed.group, n_tiles=packed.n_tiles, k=k,
            interpret=config.interpret(),
        )
        out = out.reshape(packed.n_tiles, k, _LANES)
        touched = (
            jnp.zeros(packed.n_tiles, bool)
            .at[packed.group_tile[g0:g1]]
            .set(True)
        )
        y = y + jnp.where(touched[:, None, None], out, 0)
    return y.transpose(0, 2, 1).reshape(packed.n_tiles * _LANES, k)[:rows]


@jax.custom_vjp
def spmm_dualgather(packed: DualGather, X):
    """``Y = A @ X`` over a dual-gather pack; X is (n, k) dense.

    Requires a k_tiles=1 pack without tail/splits (the per-tile grid —
    ops.spmm's auto path builds exactly this).  Differentiable in X and
    in the slab values (the spmv_dualgather VJP generalized over the RHS
    panel; the X cotangent is the XLA scatter ``A^T @ G`` — correct, not
    fast, the backward-pass stance of spmv_dualgather's fallback).
    """
    return _spmm_dg_forward(packed, X)


def _dgmm_fwd(packed, X):
    return _spmm_dg_forward(packed, X), (packed, X)


def _dgmm_bwd(res, G):
    import dataclasses

    import numpy as np

    from .spmv_dualgather import _slot_row_col

    packed, X = res
    rows, cols = packed.shape
    k = X.shape[1]
    row, col = _slot_row_col(packed)  # (n_groups, group*8, 128)
    Gpad = jnp.zeros((packed.n_tiles * _LANES, k), G.dtype).at[:rows].set(G)
    Xpad = jnp.zeros((packed.n_win * 8 * _LANES, k), X.dtype
                     ).at[:cols].set(X)
    gv = Gpad[row] * packed.vals[..., None]  # (n_groups, GH, 128, k)
    gX = (jnp.zeros((packed.n_win * 8 * _LANES, k), X.dtype)
          .at[col.reshape(-1)]
          .add(gv.reshape(-1, k).astype(X.dtype)))[:cols]
    mask = packed.vals != 0  # padding slots carry no gradient
    dvals = jnp.where(
        mask, jnp.sum(Xpad[col] * Gpad[row], axis=-1), 0
    ).astype(packed.vals.dtype)

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    dpacked = jax.tree_util.tree_map(ct_zero, packed)
    dpacked = dataclasses.replace(dpacked, vals=dvals)
    return dpacked, gX


spmm_dualgather.defvjp(_dgmm_fwd, _dgmm_bwd)
