"""Clos-routed planned permutation — arbitrary ``out[i] = x[g[i]]`` in
O(1) bandwidth passes instead of a sort network.

``lax.sort_key_val`` moves ~1.6 ns/element (ops/permute.py); an
arbitrary gather ~6.7 ns/element.  Both are far off the ~0.02 ns/element
HBM roofline for what is, at plan time, a KNOWN bijection.  This module
routes the permutation through a rearrangeable Clos network realized
with full-bandwidth TPU primitives:

  view x as an (R, 1024) grid.  Any bijection factors as
      P = R1 (row-local) ∘ Pcol (column-local) ∘ R3 (row-local)
  by König edge coloring: color element e (source row s, dest row d)
  in the R×R bipartite multigraph with 1024 colors; its color m is the
  intermediate column.  Each row-local stage is a batch of window
  bijections run by the 3-gather Pallas kernel
  (kernels/permute_pallas.py); Pcol becomes row-local after an XLA
  transpose of the grid.  For R ≤ 1024 that is 3 kernel stages + 2
  transposes; for R = q·1024 the middle row length is q·1024 and
  factors once more (two window stages around a cheap q-way select),
  giving 5 stages + 2 transposes for caps up to 8M.

Cost model per element: 3–5 × (8 B data + 3 B planes) + 2 × 8 B
transpose ≈ 50–70 B ≈ 0.06–0.09 ns — 20–25× under the sort.  The
planes are built once on the host (native smtpu_edge_color, Euler
split; numpy fallback for small plans).

No reference analogue (the reference permutes on the host,
sparse-matrix.cc:102-137); this is the engineered TPU primitive behind
SpGEMM's b/c-permutes and every other planned reorder.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.base import register_sparse_pytree
from ..kernels.permute_pallas import window_permute

__all__ = ["ClosPermutePlan", "plan_clos_permutation",
           "apply_clos_permutation"]

_W = 1024
_MAX_Q = 8  # cap = q * 1024 * 1024 ≤ 8M; larger falls back to the sort


def _edge_color_native(left, right, n_left, n_right, n_colors):
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if lib is None or not hasattr(lib, "smtpu_edge_color"):
        return None
    import ctypes

    l32 = np.ascontiguousarray(left, np.int32)
    r32 = np.ascontiguousarray(right, np.int32)
    out = np.empty(len(l32), np.int32)
    rc = lib.smtpu_edge_color(
        l32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        r32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(l32), int(n_left), int(n_right), int(n_colors),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def _edge_color_py(left, right, n_left, n_right, n_colors):
    """Python Euler-split (tests / no-compiler fallback; O(E log C) with
    per-edge python steps — fine for the ≤100k-edge plans tests use)."""
    n_edges = len(left)
    assert n_edges == n_left * n_colors == n_right * n_colors
    color = np.zeros(n_edges, np.int64)
    classes = [np.arange(n_edges)]
    deg = n_colors
    while deg > 1:
        nxt = []
        for idx in classes:
            # adjacency: vertex -> incident edge list (left then right)
            nv = n_left + n_right
            heads = [[] for _ in range(nv)]
            for e in idx:
                heads[left[e]].append(e)
                heads[n_left + right[e]].append(e)
            used = set()
            cursor = [0] * nv
            bit_of = {}
            for e0 in idx:
                if e0 in used:
                    continue
                v = left[e0]
                bit = 0
                while True:
                    e = -1
                    while cursor[v] < len(heads[v]):
                        cand = heads[v][cursor[v]]
                        if cand not in used:
                            e = cand
                            break
                        cursor[v] += 1
                    if e < 0:
                        break
                    used.add(e)
                    bit_of[e] = bit
                    bit ^= 1
                    v = (n_left + right[e]) if v == left[e] else left[e]
            a = np.array([e for e in idx if bit_of[e] == 0], np.int64)
            b = np.array([e for e in idx if bit_of[e] == 1], np.int64)
            color[a] = color[a] << 1
            color[b] = (color[b] << 1) | 1
            nxt += [a, b]
        classes = nxt
        deg >>= 1
    return color


def _edge_color(left, right, n_left, n_right, n_colors):
    out = _edge_color_native(left, right, n_left, n_right, n_colors)
    if out is None:
        out = _edge_color_py(np.asarray(left), np.asarray(right),
                             n_left, n_right, n_colors)
    return np.asarray(out, np.int64)


def _edge_color_grouped(batch, left_small, right_small, n_batch, nsmall,
                        n_colors):
    """Batched independent small-bipartite colorings (each batch is an
    nsmall×nsmall multigraph, degrees == n_colors).  Native count-matrix
    Euler splitter (smtpu_edge_color_batched: L1-resident, ~40× the
    generic edge-walk colorer at the planner's sizes); falls back to one
    disjoint-union call of the generic colorer."""
    from .. import native as native_mod

    lib = native_mod.get_lib()
    if lib is not None and hasattr(lib, "smtpu_edge_color_batched"):
        import ctypes

        l32 = np.ascontiguousarray(left_small, np.int32)
        r32 = np.ascontiguousarray(right_small, np.int32)
        b32 = np.ascontiguousarray(batch, np.int32)
        out = np.empty(len(l32), np.int32)
        rc = lib.smtpu_edge_color_batched(
            l32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            r32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(l32), int(n_batch), int(nsmall), int(nsmall),
            int(n_colors),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc == 0:
            return out.astype(np.int64)
    return _edge_color(batch * nsmall + left_small,
                       batch * nsmall + right_small,
                       n_batch * nsmall, n_batch * nsmall, n_colors)


def _window_planes(win, spos, dpos, n_windows):
    """POS/CH/RT planes for a batch of window bijections.

    ``win``/``spos``/``dpos``: per element the window id, source
    position and destination position in [0, 1024); each window's map
    must be a bijection (all positions covered exactly once)."""
    su, sl = spos // 128, spos % 128
    du, dl = dpos // 128, dpos % 128
    m = _edge_color_grouped(win, du, su, n_windows, 8, 128)
    pos = np.empty((n_windows, 8, 128), np.int8)
    chk = np.empty((n_windows, 8, 128), np.int8)
    rte = np.empty((n_windows, 8, 128), np.int8)
    pos[win, su, m] = sl
    chk[win, du, m] = su
    rte[win, du, dl] = m
    return (jnp.asarray(pos), jnp.asarray(chk), jnp.asarray(rte))


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class ClosPermutePlan:
    """Planes for 3 (q=1) or 4 (q>1) window stages + the q-way select."""

    planes: tuple  # of (pos, chk, rte) triples, int8 (W_stage, 8, 128)
    sel: object  # int8 (1024, q, 1024) source-t per (row, t_d, m2); None q=1
    mask_src: object  # (n_out,) int32 source ids for sentinel zeroing, or None
    inv: object  # (n_src,) int32 output slot per source (n_out = dropped)
    cap: int = dataclasses.field(metadata={"static": True})
    R: int = dataclasses.field(metadata={"static": True})
    q: int = dataclasses.field(metadata={"static": True})
    n_out: int = dataclasses.field(metadata={"static": True})
    n_src: int = dataclasses.field(metadata={"static": True})


def _extend_bijection(g, n_src, n_out):
    """out-slot → source-id bijection on [0, cap) (ops/permute.py
    semantics: sentinel slots read zero padding where possible)."""
    g = np.asarray(g)[:n_out]
    cap = max(n_out, n_src)
    real = g < n_src
    used = g[real]
    if len(np.unique(used)) != len(used):
        raise ValueError("gather map must be injective on real slots")
    p = np.full(cap, -1, np.int64)
    pre = p[:n_out]
    pre[real] = used
    p[:n_out] = pre
    unused = np.setdiff1d(np.arange(cap), used, assume_unique=False)
    p[p < 0] = unused[::-1]
    mask_needed = bool((p[:n_out][~real] < n_src).any())
    return p, cap, (np.where(real, g, n_src).astype(np.int32)
                    if mask_needed else None)


def _geometry(n):
    """Smallest supported (R, q): R = 2^k ≤ 1024 rows (powers of two so
    the transposed grid packs k = 1024/R segments per window), or
    R = q·1024 with ANY integer q (the middle level needs no divisibility
    — Selq and the q×q colorings work for arbitrary q)."""
    R = 8
    while R * _W < n and R < _W:
        R *= 2
    if R * _W >= n:
        return R, 1
    q = -(-n // (_W * _W))
    if q > _MAX_Q:
        return None, None
    return q * _W, q


def plan_clos_permutation(g, n_src: int, n_out: int | None = None):
    """Plan ``out[i] = x[g[i]]`` (injective ``g``; entries ≥ n_src read
    0).  Returns None when the size is out of the supported range
    (caller falls back to ops/permute.py)."""
    g = np.asarray(g)
    n_out = len(g) if n_out is None else n_out
    R, q = _geometry(max(n_out, n_src))
    if R is None:
        return None
    cap = R * _W
    p, _, mask_src = _extend_bijection(g, n_src, n_out)
    if len(p) < cap:  # extend to the padded geometry with identity tail
        extra = np.arange(len(p), cap)
        p = np.concatenate([p, extra])
    i = np.arange(cap)
    s_row, s_col = p // _W, p % _W
    d_row, d_col = i // _W, i % _W
    m1 = _edge_color(s_row, d_row, R, R, _W)
    planes = [_window_planes(s_row, s_col, m1, R)]
    sel = None
    if q == 1:
        # transposed grid (1024, R) packs k = 1024/R rows per window
        a2 = m1 * R + s_row
        a3 = m1 * R + d_row
        planes.append(_window_planes(a2 // _W, a2 % _W, a3 % _W,
                                     cap // _W))
    else:
        s_t, s_j = s_row // _W, s_row % _W
        d_t, d_j = d_row // _W, d_row % _W
        m2 = _edge_color_grouped(m1, s_t, d_t, _W, q, _W)
        planes.append(_window_planes(m1 * q + s_t, s_j, m2, _W * q))
        h = np.empty((_W, q, _W), np.int8)
        h[m1, d_t, m2] = s_t
        sel = jnp.asarray(h)
        planes.append(_window_planes(m1 * q + d_t, m2, d_j, _W * q))
    planes.append(_window_planes(d_row, m1, d_col, R))
    # inverse map for the VJP: output slot of each source element
    inv = np.full(n_src, n_out, np.int64)
    g_out = g[:n_out]
    live = g_out < n_src
    inv[g_out[live]] = np.flatnonzero(live)
    return ClosPermutePlan(
        planes=tuple(planes), sel=sel,
        mask_src=(None if mask_src is None else jnp.asarray(mask_src)),
        inv=jnp.asarray(inv, jnp.int32),
        cap=cap, R=R, q=q, n_out=int(n_out), n_src=int(n_src))


def apply_clos_permutation(plan: ClosPermutePlan, x, *,
                           interpret: bool = False):
    """Run the planned permutation on device (jittable; differentiable
    in ``x`` — the cotangent applies the INVERSE map as a gather:
    correct, not fast, the framework's backward-pass stance)."""
    return _apply_clos(plan, x, bool(interpret))


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _apply_clos(plan, x, interpret):
    return _apply_clos_impl(plan, x, interpret)


def _clos_fwd(plan, x, interpret):
    # residual: the plan plus x's ignored tail (zero-grad, keeps the
    # cotangent shape/dtype static without storing x itself)
    return _apply_clos(plan, x, interpret), (plan, x[plan.n_src:])


def _clos_bwd(interpret, res, ct):
    plan, xtail = res
    ctp = jnp.concatenate([ct, jnp.zeros((1,), ct.dtype)])
    ct_x = ctp[plan.inv].astype(xtail.dtype)
    if xtail.shape[0]:  # extra tail of x is ignored by the apply
        ct_x = jnp.concatenate([ct_x, jnp.zeros_like(xtail)])

    def ct_zero(p):
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
            return jnp.zeros_like(p)
        return np.zeros(jnp.shape(p), jax.dtypes.float0)

    return (jax.tree_util.tree_map(ct_zero, plan), ct_x)


_apply_clos.defvjp(_clos_fwd, _clos_bwd)


def _apply_clos_impl(plan: ClosPermutePlan, x, interpret: bool):
    R, q, cap = plan.R, plan.q, plan.cap
    kw = dict(interpret=interpret)
    if interpret:
        # CPU interpreter: widen the int8 gather indices
        wp = lambda v, pl3: window_permute(
            v, *(p.astype(jnp.int32) for p in pl3), **kw)
    else:
        wp = lambda v, pl3: window_permute(v, *pl3, **kw)
    xp = jnp.zeros((cap,), x.dtype).at[: plan.n_src].set(x[: plan.n_src])
    v = wp(xp.reshape(R, 8, 128), plan.planes[0])
    v = v.reshape(R, _W).T  # (1024, R)
    if q == 1:
        v = wp(v.reshape(-1, 8, 128), plan.planes[1])
    else:
        v = wp(v.reshape(-1, 8, 128), plan.planes[1])
        v = v.reshape(_W, q, _W)
        h = plan.sel
        out = jnp.zeros_like(v)
        for t in range(q):
            out = out + jnp.where(h == t, v[:, t][:, None, :], 0)
        v = wp(out.reshape(-1, 8, 128), plan.planes[2])
    v = v.reshape(_W, R).T  # back to (R, 1024)
    v = wp(v.reshape(R, 8, 128), plan.planes[-1])
    out = v.reshape(-1)[: plan.n_out]
    if plan.mask_src is not None:
        out = jnp.where(plan.mask_src < plan.n_src, out, 0)
    return out
