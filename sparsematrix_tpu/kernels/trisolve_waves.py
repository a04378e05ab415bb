"""Wave-batched triangular solve — MXU block-inverse commits.

``trisolve_fused_apply`` (trisolve_fused.py) walks (level, tile) segments
sequentially; its grid-step count — and therefore its latency — is bound
by the dependency-level count (the 64×64 Poisson ILU factor has 127
levels → ~160 grid steps → ~96 µs).  This kernel removes the level
structure from the critical path entirely: rows are partitioned into
fixed 128-row *tiles* and the per-tile diagonal blocks are inverted **on
the host at plan time**, so the device solve is a short chain of MXU
matmuls instead of a long chain of gated VPU commits:

  chain mode (tile reach ≤ K ≤ 3 — banded factors, RCM/level-sorted ILU):
      x_t = b_t · A1_t − Σ_{k=1..K} x_{t−k} · A2ᵏ_t
    with A1_t = inv(D_t)^T and A2ᵏ_t = C_{t,k}^T · inv(D_t)^T precomputed
    (D_t = T[tile t, tile t], C_{t,k} = T[tile t, tile t−k]).  One grid
    step commits a *wave* of 8 tiles (one aligned (8,128) block of x): 8
    independent + 8·K chain-dependent (8,128)@(128,128) matmuls.  No
    gathers, no slabs: total grid steps = n/1024.

  binv mode (general patterns): waves of ``m`` tiles; the (128·m)² wave
  diagonal block is inverted on the host, cross-wave entries are packed
  into row-lane slabs (gathered from the committed x prefix exactly as in
  trisolve_fused), and the commit applies the dense inverse with m²
  (8,128)@(128,128) matmuls.

Trade: the plan stores dense inverse blocks (n·128·4 B chain, n·128·m·4 B
binv) — ~50× the factor's nnz bytes for a Poisson system — in exchange
for a grid-step count independent of the level depth.  At n=4096 that is
4 chain steps streaming 4 MB vs 160 gated steps: ~10× faster, the
VERDICT round-2 item 6 bar.

No reference counterpart (the reference has no triangular solves;
SURVEY §2 C-inventory) — this is the TPU answer to cuSPARSE
csrsv2's analysis/solve split, with the analysis products chosen for the
MXU (dense block inverses) instead of for SIMT level scheduling.
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

__all__ = ["TriWavesPlan", "trisolve_waves_plan", "trisolve_waves_apply",
           "trisolve_waves_apply_mm", "trisolve_waves_solve"]

_LANES = 128
_W = 1024
_PREC = jax.lax.Precision.HIGHEST


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class TriWavesPlan:
    """Host-inverted block program for the wave solve."""

    a1: jnp.ndarray  # chain: (n_waves, 1024, 128) per-tile inv(D)^T
    #                  binv: (n_waves, m*128, m*128) per-wave inv^T
    a2: Optional[jnp.ndarray]  # chain only: (n_waves, K*1024, 128),
    #                  tile-major ([t][k] at row (t*K + k-1)*128)
    s_idx: Optional[jnp.ndarray]  # binv: (n_groups, group*8, 128) int8
    vals: Optional[jnp.ndarray]  # binv: (n_groups, group*8, 128)
    group_wave: Optional[jnp.ndarray]  # binv: (n_groups,) int32
    seg_first: Optional[jnp.ndarray]  # binv: (n_groups,) int32 0/1
    commit: Optional[jnp.ndarray]  # binv: (n_groups,) int32 0/1
    slab_win: Optional[jnp.ndarray]  # binv: (n_groups*group,) int32
    slab_tloc: Optional[jnp.ndarray]  # binv: (n_groups*group,) int32
    t_plan: Optional["TriWavesPlan"]  # plan of T^T for the solve VJP
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    mode: str = dataclasses.field(metadata={"static": True})  # chain|binv
    m: int = dataclasses.field(metadata={"static": True})  # tiles/wave
    n_waves: int = dataclasses.field(metadata={"static": True})
    S: int = dataclasses.field(metadata={"static": True})  # x sublanes
    group: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    lower: bool = dataclasses.field(metadata={"static": True})
    K: int = dataclasses.field(  # chain back-offsets (tile reach)
        default=1, metadata={"static": True})
    reversed: bool = dataclasses.field(  # upper solve via index reversal
        default=False, metadata={"static": True})
    # pattern arrays for parameter (value) gradients — aligned to the
    # planned CSR's capacity-padded ``data`` slots (with_grads=True)
    pat_rows: Optional[jnp.ndarray] = None  # (capacity,) int32
    pat_cols: Optional[jnp.ndarray] = None  # (capacity,) int32
    pat_scale: Optional[jnp.ndarray] = None  # (capacity,) 0/1 f32


def _dense_block(sp, r0, r1, c0, c1):
    out = np.zeros((r1 - r0, c1 - c0), np.float64)
    blk = sp[r0:min(r1, sp.shape[0]), c0:min(c1, sp.shape[1])].tocoo()
    out[blk.row, blk.col] = blk.data
    return out


def _diag_blocks(r, c, v, B, n_blocks):
    """All (B, B) diagonal blocks in ONE vectorized pass.

    The round-3 plan builder sliced scipy per block (sp[r0:r1, c0:c1] —
    ~10-30 ms each), which dominated setup (32-38 s at n=65536,
    BASELINE ilu_cg_xl).  A single fancy-index scatter replaces ~all of
    it (measured ~100× on the XL plan)."""
    out = np.zeros((n_blocks, B, B), np.float64)
    blk = r // B
    sel = (c // B) == blk
    out[blk[sel], r[sel] % B, c[sel] % B] = v[sel]
    return out


def _sub_blocks(r, c, v, B, n_blocks, K):
    """All (B, B) sub-diagonal blocks at reach 1..K, one scatter."""
    out = np.zeros((n_blocks, K, B, B), np.float64)
    bd = r // B - c // B
    sel = (bd >= 1) & (bd <= K)
    out[(r[sel] // B), bd[sel] - 1, r[sel] % B, c[sel] % B] = v[sel]
    return out


def _invert_lower(D, n_real):
    """inv of a dense lower-triangular block; padding rows → identity."""
    import scipy.linalg as sla

    B = D.shape[0]
    for j in range(n_real, B):
        D[j, j] = 1.0
    return sla.solve_triangular(D, np.eye(B), lower=True,
                                check_finite=False)


def _pack_wave_slabs(r, c, v, m, n_tiles, n_win, group):
    """Row-lane slabs for cross-wave entries, segmented per wave.

    Slab = (8 column-chunks of window w) × (128 rows of tile t); entries
    keyed (wave, tile, window, chunk, lane) with occurrence rank d
    choosing the slab — the trisolve_fused bucketing with the wave as the
    major key.  Every wave gets ≥ 1 (possibly all-zero) group so its
    commit step exists.
    """
    n_waves = -(-n_tiles // m)
    t = r // _LANES
    lane = r % _LANES
    w = c // _W
    u = (c % _W) // _LANES
    sidx = c % _LANES
    wave = t // m
    tloc = t % m

    if r.size:
        bucket = (((t * n_win + w) * 8 + u) * _LANES + lane)
        order = np.argsort(bucket, kind="stable")
        bo = bucket[order]
        new = np.empty(len(bo), bool)
        new[0] = True
        new[1:] = bo[1:] != bo[:-1]
        run_start = np.maximum.accumulate(
            np.where(new, np.arange(len(bo)), 0))
        d = np.arange(len(bo)) - run_start
        d_span = int(d.max()) + 1
        slab_key = ((t[order] * n_win + w[order]) * d_span + d)
        uslab, inv = np.unique(slab_key, return_inverse=True)
        slab_t = uslab // (n_win * d_span)
        slab_w = (uslab // d_span) % n_win
        slab_wave = slab_t // m
    else:
        order = np.zeros(0, np.int64)
        d = np.zeros(0, np.int64)
        uslab = np.zeros(0, np.int64)
        inv = np.zeros(0, np.int64)
        slab_t = np.zeros(0, np.int64)
        slab_w = np.zeros(0, np.int64)
        slab_wave = np.zeros(0, np.int64)

    counts = np.bincount(slab_wave, minlength=n_waves)
    if group is None:
        group = 1
        total = max(counts.sum(), 1)
        for gq in (8, 4, 2):
            padded = np.maximum(-(-counts // gq), 1) * gq
            if (padded.sum() - total) / total <= 0.5:
                group = gq
                break
    wave_groups = np.maximum(-(-counts // group), 1)  # ≥1: commit exists
    padded = wave_groups * group
    wave_offset = np.concatenate([[0], np.cumsum(padded)])
    first_of_wave = np.concatenate([[0], np.cumsum(counts)])[:-1]
    rank = np.arange(len(uslab)) - first_of_wave[slab_wave]
    slot = wave_offset[slab_wave] + rank
    total_slots = int(wave_offset[-1])
    n_groups = total_slots // group

    s_idx = np.zeros((total_slots, 8, _LANES), np.int8)
    vals = np.zeros((total_slots, 8, _LANES), v.dtype)
    win_arr = np.zeros(total_slots, np.int32)
    tloc_arr = np.zeros(total_slots, np.int32)
    entry_slot = slot[inv]
    s_idx[entry_slot, u[order], lane[order]] = sidx[order]
    vals[entry_slot, u[order], lane[order]] = v[order]
    win_arr[slot] = slab_w
    tloc_arr[slot] = slab_t % m

    gw = np.repeat(np.arange(n_waves), wave_groups).astype(np.int32)
    pos = np.arange(len(gw)) - np.concatenate(
        [[0], np.cumsum(wave_groups)])[gw]
    sfirst = (pos == 0).astype(np.int32)
    scommit = (pos == wave_groups[gw] - 1).astype(np.int32)
    return dict(
        s_idx=s_idx.reshape(n_groups, group * 8, _LANES),
        vals=vals.reshape(n_groups, group * 8, _LANES),
        group_wave=gw, seg_first=sfirst, commit=scommit,
        slab_win=win_arr, slab_tloc=tloc_arr, group=int(group),
    )


def trisolve_waves_plan(A: CSR, lower: bool = True,
                        unit_diagonal: bool = False,
                        mode: str = "auto", m: int = 8,
                        with_transpose: bool = False,
                        with_grads: bool = False,
                        dtype=None) -> TriWavesPlan:
    """Invert diagonal blocks on the host, pack the rest for the device.

    ``mode``: "chain" (requires every off-diagonal entry within one tile
    of the diagonal — banded factors), "binv" (general), or "auto"
    (chain when the tile reach allows, else binv).  ``m``: tiles per
    binv wave (wave block = 128·m).  ``dtype=jnp.bfloat16`` stores the
    inverse blocks and slab values bf16 (fp32 accumulation) —
    preconditioner-grade only.
    """
    sp = A.to_scipy().tocsr()
    n = sp.shape[0]
    if sp.shape[0] != sp.shape[1]:
        raise ValueError("trisolve needs a square matrix")
    perm = None
    if not lower:
        # reversal permutation turns an upper system into a lower one
        perm = np.arange(n - 1, -1, -1)
        sp = sp[perm][:, perm].tocsr()
    sp.sort_indices()
    coo = sp.tocoo()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data
    if (c > r).any():
        raise ValueError("matrix is not triangular in the requested "
                         "orientation")
    if not unit_diagonal:
        dmask = r == c
        drows = np.zeros(n, bool)
        drows[r[dmask]] = v[dmask] != 0
        if not drows.all():
            bad = int(np.nonzero(~drows)[0][0])
            raise ValueError(f"zero/missing diagonal at row {bad}")

    offd = c < r
    reach = int((r[offd] // _LANES - c[offd] // _LANES).max()) if \
        offd.any() else 0
    if mode == "auto":
        mode = "chain" if reach <= 3 else "binv"
    if mode == "chain" and reach > 3:
        raise ValueError(f"chain mode needs tile reach ≤ 3, got {reach}")
    if mode not in ("chain", "binv"):
        raise ValueError(f"unknown mode {mode!r}")
    K = max(reach, 1)

    n_tiles = max(-(-n // _LANES), 1)
    vdt = np.float32 if dtype is None else np.dtype(jnp.bfloat16
                                                    if dtype == jnp.bfloat16
                                                    else dtype)
    if unit_diagonal:
        # work on the coo arrays directly (a lil round-trip at XL costs
        # seconds): force stored diagonal entries to 1 and append any
        # missing ones
        dmask = r == c
        v = v.copy()
        v[dmask] = 1.0
        have = np.zeros(n, bool)
        have[r[dmask]] = True
        missing = np.nonzero(~have)[0]
        if missing.size:
            r = np.concatenate([r, missing])
            c = np.concatenate([c, missing])
            v = np.concatenate([v, np.ones(missing.size, v.dtype)])

    if mode == "chain":
        n_waves = -(-n_tiles // 8)
        S = n_waves * 8
        D = _diag_blocks(r, c, v, _LANES, S)
        # padding: identity rows past n (whole tiles AND the ragged tail)
        tiles_r0 = np.arange(S) * _LANES
        pad_from = np.clip(n - tiles_r0, 0, _LANES)
        rows_iota = np.arange(_LANES)
        pad_mask = rows_iota[None, :] >= pad_from[:, None]  # (S, 128)
        D[np.nonzero(pad_mask)[0], np.nonzero(pad_mask)[1],
          np.nonzero(pad_mask)[1]] = 1.0
        # batched inversion: LAPACK LU over the whole stack (the matrices
        # are triangular, so LU is exact and cheap)
        invD = np.linalg.solve(D, np.broadcast_to(
            np.eye(_LANES), D.shape).copy())
        a1 = invD.transpose(0, 2, 1).copy()  # inv^T
        C = _sub_blocks(r, c, v, _LANES, S, K)
        # a2[t, k-1] = C^T · inv^T = (inv · C)^T, batched
        a2 = np.matmul(invD[:, None], C).transpose(0, 1, 3, 2)
        plan_kwargs = dict(
            a1=jnp.asarray(a1.reshape(n_waves, 8 * _LANES, _LANES), vdt),
            a2=jnp.asarray(
                a2.reshape(n_waves, 8 * K * _LANES, _LANES), vdt),
            s_idx=None, vals=None, group_wave=None, seg_first=None,
            commit=None, slab_win=None, slab_tloc=None,
            m=8, K=K, n_waves=n_waves, S=S, group=1,
            n_win=max(-(-n // _W), 1),
        )
    else:
        n_waves = -(-n_tiles // m)
        S = 8 * (-(-(n_waves * m) // 8))
        B = m * _LANES
        D = _diag_blocks(r, c, v, B, n_waves)
        waves_r0 = np.arange(n_waves) * B
        pad_from = np.clip(n - waves_r0, 0, B)
        rows_iota = np.arange(B)
        pad_mask = rows_iota[None, :] >= pad_from[:, None]
        D[np.nonzero(pad_mask)[0], np.nonzero(pad_mask)[1],
          np.nonzero(pad_mask)[1]] = 1.0
        import scipy.linalg as sla

        a1 = np.empty((n_waves, B, B), np.float64)
        eye = np.eye(B)
        for i in range(n_waves):  # per-wave O(B³/3) triangular solves
            a1[i] = sla.solve_triangular(D[i], eye, lower=True,
                                         check_finite=False).T
        cross = c < (r // B) * B
        packed = _pack_wave_slabs(r[cross], c[cross], v[cross].astype(vdt),
                                  m, n_tiles, max(-(-n // _W), 1), None)
        plan_kwargs = dict(
            a1=jnp.asarray(a1, vdt), a2=None,
            s_idx=jnp.asarray(packed["s_idx"], jnp.int8),
            vals=jnp.asarray(packed["vals"], vdt),
            group_wave=jnp.asarray(packed["group_wave"], jnp.int32),
            seg_first=jnp.asarray(packed["seg_first"], jnp.int32),
            commit=jnp.asarray(packed["commit"], jnp.int32),
            slab_win=jnp.asarray(packed["slab_win"], jnp.int32),
            slab_tloc=jnp.asarray(packed["slab_tloc"], jnp.int32),
            m=m, n_waves=n_waves, S=S, group=packed["group"],
            n_win=max(-(-n // _W), 1),
        )

    t_plan = None
    if with_transpose or with_grads:
        import scipy.sparse as sps

        At = CSR.from_scipy(sps.csr_matrix(A.to_scipy().T))
        t_plan = trisolve_waves_plan(At, lower=not lower,
                                     unit_diagonal=unit_diagonal,
                                     mode=mode, m=m,
                                     with_transpose=False, dtype=dtype)
    if with_grads:
        # pattern slots aligned to A.data (capacity-padded) for the
        # implicit-function value cotangent v̄_ij = −(T⁻ᵀg)_i · x_j
        cap = A.indices.shape[0]
        counts = np.diff(np.asarray(A.indptr))
        rws = np.repeat(np.arange(A.shape[0], dtype=np.int64), counts)
        prow = np.zeros(cap, np.int32)
        prow[: len(rws)] = rws
        pcol = np.asarray(A.indices, np.int32).copy()
        scale = np.zeros(cap, np.float32)
        scale[: len(rws)] = 1.0
        if unit_diagonal:  # stored diagonal is inert under unit_diagonal
            scale[: len(rws)][rws == pcol[: len(rws)].astype(np.int64)] = 0.0
        plan_kwargs.update(pat_rows=jnp.asarray(prow),
                           pat_cols=jnp.asarray(pcol),
                           pat_scale=jnp.asarray(scale))
    return TriWavesPlan(
        t_plan=t_plan,
        shape=(n, n), mode=mode, lower=lower, reversed=perm is not None,
        **plan_kwargs,
    )


def _chain_kernel(b_ref, a1_ref, a2_ref, o_ref, *, K: int):
    i = pl.program_id(0)
    bblk = b_ref[:].astype(jnp.float32)  # (8, 128)
    iz = jnp.maximum(i - 1, 0)
    pb = o_ref[pl.ds(pl.multiple_of(iz * 8, 8), 8), :]
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    # hist[-k] = x_{t−k}; seeded with the previous wave's last K rows
    hist = []
    for j in range(8 - K, 8):
        row = jnp.sum(jnp.where(sub == j, pb, 0.0), axis=0, keepdims=True)
        hist.append(jnp.where(i > 0, row, jnp.zeros_like(row)))
    out = jnp.zeros((8, _LANES), jnp.float32)
    for t in range(8):
        A1t = a1_ref[0, t * _LANES:(t + 1) * _LANES, :].astype(jnp.float32)
        g_full = jax.lax.dot(bblk, A1t, precision=_PREC,
                             preferred_element_type=jnp.float32)
        x_t = g_full[t:t + 1, :]
        for k in range(1, K + 1):
            base = (t * K + (k - 1)) * _LANES
            A2kt = a2_ref[0, base:base + _LANES, :].astype(jnp.float32)
            h_full = jax.lax.dot(
                jnp.broadcast_to(hist[-k], (8, _LANES)), A2kt,
                precision=_PREC, preferred_element_type=jnp.float32)
            x_t = x_t - h_full[0:1, :]
        out = out + jnp.where(sub == t, jnp.broadcast_to(x_t, (8, _LANES)),
                              0.0)
        hist.append(x_t)
    o_ref[pl.ds(pl.multiple_of(i * 8, 8), 8), :] = out


@functools.partial(jax.jit, static_argnames=("S", "K", "interpret"))
def _chain_call(a1, a2, b2d, *, S, K, interpret=False):
    n_waves = a1.shape[0]
    return pl.pallas_call(
        functools.partial(_chain_kernel, K=K),
        grid=(n_waves,),
        in_specs=[
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * _LANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * K * _LANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, _LANES), jnp.float32),
        interpret=interpret,
    )(b2d, a1, a2)


def _binv_kernel(gw_ref, segf_ref, com_ref, win_ref, tloc_ref, sidx_ref,
                 vals_ref, a1_ref, b_ref, o_ref, acc_ref, *, group: int,
                 m: int):
    g = pl.program_id(0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(segf_ref[g] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc = jnp.zeros((8, _LANES), jnp.float32)
    for b in range(group):
        w = win_ref[g * group + b]
        tl = tloc_ref[g * group + b]
        xw = o_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        sidx = sidx_ref[0, b * 8:(b + 1) * 8, :]
        gth = jnp.take_along_axis(xw, sidx, axis=1)
        contrib = jnp.sum(
            vals_ref[0, b * 8:(b + 1) * 8, :].astype(jnp.float32) * gth,
            axis=0, keepdims=True)
        acc = acc + jnp.where(sub == tl,
                              jnp.broadcast_to(contrib, (8, _LANES)), 0.0)
    acc_ref[:] = acc_ref[:] + acc

    @pl.when(com_ref[g] == 1)
    def _():
        i = gw_ref[g]
        base = pl.multiple_of((i * m // 8) * 8, 8)
        off = (i * m) % 8
        bblk = b_ref[pl.ds(base, 8), :].astype(jnp.float32)
        xb = o_ref[pl.ds(base, 8), :]
        # u frame: rows 0..m-1 = b[wave rows] − acc rows
        uf = jnp.zeros((8, _LANES), jnp.float32)
        for s in range(m):
            brow = jnp.sum(jnp.where(sub == off + s, bblk, 0.0), axis=0,
                           keepdims=True)
            u_s = brow - acc_ref[s:s + 1, :]
            uf = uf + jnp.where(sub == s,
                                jnp.broadcast_to(u_s, (8, _LANES)), 0.0)
        newv = xb
        for s in range(m):
            tot = jnp.zeros((1, _LANES), jnp.float32)
            for sq in range(m):
                Tsub = a1_ref[0, sq * _LANES:(sq + 1) * _LANES,
                              s * _LANES:(s + 1) * _LANES].astype(
                                  jnp.float32)
                pf = jax.lax.dot(uf, Tsub, precision=_PREC,
                                 preferred_element_type=jnp.float32)
                tot = tot + pf[sq:sq + 1, :]
            newv = jnp.where(sub == off + s,
                             jnp.broadcast_to(tot, (8, _LANES)), newv)
        o_ref[pl.ds(base, 8), :] = newv


@functools.partial(jax.jit,
                   static_argnames=("group", "m", "S", "interpret"))
def _binv_call(group_wave, seg_first, commit, slab_win, slab_tloc, s_idx,
               vals, a1, b2d, *, group, m, S, interpret=False):
    n_groups = s_idx.shape[0]
    B = m * _LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, gw, sf, cm, wn, tl: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, _LANES),
                         lambda g, gw, sf, cm, wn, tl: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, B),
                         lambda g, gw, sf, cm, wn, tl: (gw[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b (S, 128)
        ],
        out_specs=pl.BlockSpec((S, _LANES),
                               lambda g, gw, sf, cm, wn, tl: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_binv_kernel, group=group, m=m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, _LANES), jnp.float32),
        interpret=interpret,
    )(group_wave, seg_first, commit, slab_win, slab_tloc, s_idx, vals, a1,
      b2d)


def _rev_pad(v, n, N):
    """Reversal permutation of the padded vector WITHOUT a gather:
    ``out[i] = v_padded[n−1−i]`` via flip + roll (both lower to cheap
    vectorized slices; a 65k index gather measured ~440 µs on TPU, the
    flip ~1 µs).  Self-inverse on the first n entries."""
    return jnp.roll(jnp.flip(v), n - N)


def _waves_forward(plan: TriWavesPlan, b):
    n = plan.shape[0]
    N = plan.S * _LANES
    bp = jnp.zeros((N,), jnp.float32).at[:n].set(b.astype(jnp.float32))
    if plan.reversed:
        bp = _rev_pad(bp, n, N)
    b2d = bp.reshape(plan.S, _LANES)
    if plan.mode == "chain":
        out = _chain_call(plan.a1, plan.a2, b2d, S=plan.S, K=plan.K,
                          interpret=config.interpret())
    else:
        out = _binv_call(plan.group_wave, plan.seg_first, plan.commit,
                         plan.slab_win, plan.slab_tloc, plan.s_idx,
                         plan.vals, plan.a1, b2d, group=plan.group,
                         m=plan.m, S=plan.S,
                         interpret=config.interpret())
    x = out.reshape(-1)
    if plan.reversed:
        x = _rev_pad(jax.lax.optimization_barrier(x), n, N)
    return x[:n]


@jax.custom_vjp
def trisolve_waves_apply(plan: TriWavesPlan, b):
    """Device solve ``x = T⁻¹ b`` (jittable), wave-batched.

    Differentiable in ``b`` when the plan was built with
    ``with_transpose=True`` (``ḡ_b = T⁻ᵀ g`` rides the transposed wave
    plan).  NOT differentiable in the matrix values: the plan stores
    host-inverted blocks, so value cotangents would need the inverse
    chain rule — use ``trisolve_fused_apply`` for parameter gradients.
    """
    return _waves_forward(plan, b)


def _waves_vjp_fwd(plan, b):
    return _waves_forward(plan, b), plan


def _waves_vjp_bwd(plan, g):
    if plan.t_plan is None:
        raise ValueError(
            "trisolve_waves_apply backward pass needs the transposed plan "
            "— build with trisolve_waves_plan(..., with_transpose=True)")
    gb = _waves_forward(plan.t_plan, g)
    dplan = jax.tree_util.tree_map(_ct_zero, plan)
    return dplan, gb


def _ct_zero(p):
    if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact):
        return jnp.zeros_like(p)
    return np.zeros(jnp.shape(p), jax.dtypes.float0)


trisolve_waves_apply.defvjp(_waves_vjp_fwd, _waves_vjp_bwd)


# ---------------------------------------------------------------------------
# Multi-RHS wave solve: X = T⁻¹ B for B (n, k).
#
# Chain mode gets a true MXU kernel: the single-RHS chain commits one
# (1,128) row per tile (7/8 of every matmul output discarded); packing 8
# RHS columns into the sublane axis makes every (8,128)@(128,128) product
# fully used — k=8 solves cost ONE solve's grid steps.  The per-tile block
# is X_t = B_t @ A1_t − Σ_k X_{t−k} @ A2ᵏ_t with X_t now (8,128) (row j =
# RHS j's tile-t entries); the recurrence matrices are unchanged, so the
# same plan serves both kernels.  binv mode (data-dependent slab gathers
# against the committed prefix) falls back to a per-column scan of the
# single-RHS engine — same trade as trisolve_fused_apply_batched.
# ---------------------------------------------------------------------------


def _chain_mm_kernel(b_ref, a1_ref, a2_ref, o_ref, *, K: int):
    i = pl.program_id(0)
    iz = jnp.maximum(i - 1, 0)
    # hist[-k] = X_{t−k} (8,128); seeded with the previous wave's last K
    hist = []
    for j in range(8 - K, 8):
        blk = o_ref[pl.ds(pl.multiple_of((iz * 8 + j) * 8, 8), 8), :]
        hist.append(jnp.where(i > 0, blk, jnp.zeros_like(blk)))
    for t in range(8):
        bblk = b_ref[t * 8:(t + 1) * 8, :].astype(jnp.float32)
        A1t = a1_ref[0, t * _LANES:(t + 1) * _LANES, :].astype(jnp.float32)
        x_t = jax.lax.dot(bblk, A1t, precision=_PREC,
                          preferred_element_type=jnp.float32)
        for k in range(1, K + 1):
            base = (t * K + (k - 1)) * _LANES
            A2kt = a2_ref[0, base:base + _LANES, :].astype(jnp.float32)
            x_t = x_t - jax.lax.dot(hist[-k], A2kt, precision=_PREC,
                                    preferred_element_type=jnp.float32)
        o_ref[pl.ds(pl.multiple_of((i * 8 + t) * 8, 8), 8), :] = x_t
        hist.append(x_t)


@functools.partial(jax.jit, static_argnames=("S", "K", "interpret"))
def _chain_mm_call(a1, a2, b3d, *, S, K, interpret=False):
    n_waves = a1.shape[0]
    return pl.pallas_call(
        functools.partial(_chain_mm_kernel, K=K),
        grid=(n_waves,),
        in_specs=[
            pl.BlockSpec((64, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * _LANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * K * _LANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S * 8, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S * 8, _LANES), jnp.float32),
        interpret=interpret,
    )(b3d, a1, a2)


def _mm_forward(plan: TriWavesPlan, B):
    n = plan.shape[0]
    k = B.shape[1]
    N = plan.S * _LANES
    Bp = jnp.zeros((N, k), jnp.float32).at[:n].set(B.astype(jnp.float32))
    if plan.reversed:
        # same simplifier crash as the output flip (see below): the
        # barrier keeps the reverse off its fused operand (XLA CPU turns
        # the upstream elementwise fusion into a multi-operand kMap and
        # HandleReverse's operand-swap rewrite aborts on it)
        Bp = jax.lax.optimization_barrier(Bp)
        Bp = jnp.roll(jnp.flip(Bp, axis=0), n - N, axis=0)
    if plan.mode != "chain":
        # binv: per-column scan of the single-RHS engine
        def col(_, bc):
            out = _waves_forward(
                dataclasses.replace(plan, reversed=False),
                bc)  # reversal already applied to the whole panel
            return 0, out

        _, cols = jax.lax.scan(col, 0, Bp.T[:, :n])
        Xp = jnp.zeros((N, k), jnp.float32).at[:n].set(cols.T)
    else:
        kc = -(-k // 8)
        Bt = jnp.zeros((N, kc * 8), jnp.float32).at[:, :k].set(Bp)
        # tile-major RHS panes: rows [t*8, t*8+8) = 8 RHS of tile t
        outs = []
        for c in range(kc):
            b3d = (Bt[:, c * 8:(c + 1) * 8].T
                   .reshape(8, plan.S, _LANES)
                   .transpose(1, 0, 2)
                   .reshape(plan.S * 8, _LANES))
            o = _chain_mm_call(plan.a1, plan.a2, b3d, S=plan.S, K=plan.K,
                               interpret=config.interpret())
            o = (o.reshape(plan.S, 8, _LANES).transpose(1, 0, 2)
                 .reshape(8, N).T)
            outs.append(o)
        Xp = jnp.concatenate(outs, axis=1)[:, :k]
    if plan.reversed:
        # barrier: XLA's algebraic simplifier crashes sinking a reverse
        # into the interpret-mode pallas output (HandleReverse →
        # CreateBinary(kMap)); keep the flip out of that fusion
        Xp = jax.lax.optimization_barrier(Xp)
        Xp = jnp.roll(jnp.flip(Xp, axis=0), n - N, axis=0)
    return Xp[:n]


@jax.custom_vjp
def trisolve_waves_apply_mm(plan: TriWavesPlan, B):
    """Multi-RHS device solve ``X = T⁻¹ B`` (jittable), B is (n, k).

    Chain plans run the MXU multi-RHS kernel (8 RHS per grid pass — same
    step count as ONE single-RHS solve per 8 columns); binv plans scan
    columns.  Differentiable in ``B`` via the transposed plan
    (``with_transpose=True``), like ``trisolve_waves_apply``.
    """
    return _mm_forward(plan, B)


def _mm_vjp_fwd(plan, B):
    return _mm_forward(plan, B), plan


def _mm_vjp_bwd(plan, G):
    if plan.t_plan is None:
        raise ValueError(
            "trisolve_waves_apply_mm backward pass needs the transposed "
            "plan — build with trisolve_waves_plan(..., "
            "with_transpose=True)")
    gB = _mm_forward(plan.t_plan, G)
    return jax.tree_util.tree_map(_ct_zero, plan), gB


trisolve_waves_apply_mm.defvjp(_mm_vjp_fwd, _mm_vjp_bwd)


# ---------------------------------------------------------------------------
# Parameter gradients: x = T(vals)⁻¹ b differentiable in vals AND b.
#
# No inverse chain rule needed: by the implicit function theorem on
# T x = b, the value cotangent is  v̄_ij = −w_i · x_j  restricted to the
# sparsity pattern, with  w = T⁻ᵀ g  — one extra transposed wave solve
# plus two vector gathers.  The host-inverted blocks in the plan never
# need differentiating.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def trisolve_waves_solve(plan: TriWavesPlan, vals, b):
    """``x = T⁻¹ b`` differentiable in the matrix values and in ``b``.

    ``vals`` must be the SAME capacity-padded ``A.data`` the plan was
    built from (``trisolve_waves_plan(A, with_grads=True)``) — the
    forward pass solves with the plan's host-inverted blocks and only
    uses ``vals`` to route gradients.  Backward: one solve on the
    transposed plan + two pattern gathers (the gathers cost ~half a
    solve at n=65k; fine for a backward pass).
    """
    del vals  # numerically baked into the plan; used for AD routing only
    return _waves_forward(plan, b)


def _solve_vjp_fwd(plan, vals, b):
    x = _waves_forward(plan, b)
    return x, (plan, x, jnp.asarray(vals)[:0])  # empty slice: dtype token


def _solve_vjp_bwd(res, g):
    plan, x, vtok = res
    vdt = vtok.dtype
    if plan.t_plan is None or plan.pat_rows is None:
        raise ValueError(
            "trisolve_waves_solve backward pass needs "
            "trisolve_waves_plan(..., with_grads=True)")
    w = _waves_forward(plan.t_plan, g)  # T⁻ᵀ g
    dvals = (-(w[plan.pat_rows] * x[plan.pat_cols])
             * plan.pat_scale).astype(vdt)
    return jax.tree_util.tree_map(_ct_zero, plan), dvals, w


trisolve_waves_solve.defvjp(_solve_vjp_fwd, _solve_vjp_bwd)
