"""Fused codebook-dequantize + GEMM Pallas kernel.

The reference's headline op is ``C = beta*C + alpha * A @ B`` with B
codebook-quantized (AddMatMat, /root/reference/src/sparse/sparse-matrix.cc:140).
Its CPU kernel streams (delta, idx) pairs and does scalar AXPYs
(kernel.cc:771-800).  The TPU-native formulation here:

  * B is stored transposed as a dense index plane (``CodebookDense``) —
    no delta-decode on the hot path.
  * Dequantization happens **inside the kernel** via Mosaic's
    ``dynamic_gather`` (``take_along_axis`` along lanes).  Hardware
    constraint discovered empirically: the gather only compiles at the
    native (8, 128) vreg tile, so the 256-entry table is split into two
    128-lane halves broadcast over 8 sublanes, and each (8, 128) index
    tile does two gathers + a select.
  * Each dequantized (8, 128) value tile feeds the MXU immediately:
    ``acc += vals @ A^T[chunk]`` — dense B never exists in HBM.

Computes C^T tiles (grid over n); the final transpose is an XLA layout
choice, not a data movement.

**Status: DEPRECATED as a dispatch path (round-4 decision).**  A full
VMEM-config sweep (benchmarks/probe_codebook_sweep.py: tn∈{128,256,512},
kt∈{512,1024,2048}, mt∈{128,512}) measured the best fused config at
31.9 µs vs 17.4 µs for XLA's fused LUT-gather+dot in the same session —
the hand kernel loses ~1.8× at every point because the in-kernel
dequant costs ~6 VPU ops per (8,128) tile while XLA fuses the gather
into the matmul operand stream.  The kernel remains available explicitly
(``codebook_matmul``) at its best-known config as the measured-negative
record; ``spmm``/``add_mat_mat`` route CodebookDense to the XLA path.

STATUS (measured, rounds 2-3): this hand-written kernel LOSES to XLA's
fused dequant+dot at both benchmark shapes (48.6 vs 20.7 µs; 254.6 vs
140.3 µs — BASELINE.md codebook_gemm), because XLA fuses the table
gather into the matmul epilogue with better VMEM scheduling than the
two-gather+select workaround the Mosaic (8,128) constraint forces here.
It is therefore NOT on any auto-dispatch path — ``spmm(CodebookDense)``
and ``add_mat_mat`` route to the dequant path (ops/spmm.py
``_spmm_codebook_dense_jnp``), and the int8 quantized GEMM
(ops/quantized.py) is the fastest checked option.  The kernel stays
available explicitly (and as the measured negative result that
justifies the routing).
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats import CodebookDense
from .spmm_pallas import _matmul_precision

__all__ = ["codebook_matmul"]

_LANES = 128
# Per-grid-step panel sizes.  Round-1 sweep on the reference workload:
# TN=8 → 104 µs, TN=32 → 136, TN=64 → 122, TN=128 → 53 µs (wider tiles
# feed the 128-row systolic array fully).  Round-2: at TN=128/KT=512 the
# reference shape runs 32 grid steps whose ~0.3-0.6 µs step cost is a
# large fraction of the 24 µs total — bigger panels trade VMEM for fewer
# steps (idx (512, 2048) int8 is only 1 MB).  Module-level so the bench
# sweep can retune; threaded as static args so jit caches stay correct.
_TN = 512  # output rows (of C^T) per grid step — best of the
# r4 config sweep (31.9 us vs 52.9 at 128; probe_codebook_sweep)
_KT = 512  # k-panel per grid step (VMEM holds only per-step panels)
_MT = 512  # m-panel per grid step (m itself padded to ≥128 MXU rows)


def _cb_kernel(idx_ref, tlo_ref, thi_ref, at_ref, o_ref, *, tn: int,
               kt: int, precision):
    n_sub = tn // 8

    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def chunk_body(c, acc):
        co = pl.multiple_of(c * _LANES, _LANES)
        # int8 index plane (bit-cast uint8): 1 B/entry DMA.  The ref is
        # sliced at the full (tn, 128) chunk (int8 native tiling is
        # (32, 128) — 8-row int8 ref slices crash the Mosaic compiler)
        # and widened once; per-subtile slicing then happens in registers.
        idx_chunk = idx_ref[:, pl.ds(co, _LANES)].astype(jnp.int32)
        subs = []
        for u in range(n_sub):
            idx8 = idx_chunk[u * 8 : (u + 1) * 8, :]
            in_lo = idx8 >= 0  # 0–127 lo half; 128–255 read negative
            lo = jnp.take_along_axis(
                tlo_ref[:], jnp.where(in_lo, idx8, 0), axis=1
            )
            hi = jnp.take_along_axis(
                thi_ref[:], jnp.where(in_lo, 0, idx8 + 128), axis=1
            )
            subs.append(jnp.where(in_lo, lo, hi))  # (8, 128) dequantized
        vals = jnp.concatenate(subs, axis=0) if n_sub > 1 else subs[0]
        return acc + jnp.dot(
            vals,
            at_ref[pl.ds(co, _LANES), :],
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    acc = jax.lax.fori_loop(
        0, kt // _LANES, chunk_body, jnp.zeros(o_ref.shape, jnp.float32)
    )
    o_ref[:] = o_ref[:] + acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tn", "kt_max",
                                              "mt_max"))
def _cb_call(idx_pad, table_lo, table_hi, a_t_pad, *, interpret: bool,
             tn: int, kt_max: int, mt_max: int):
    """3-D grid (n-tile, m-tile, k-tile): every operand streams through
    VMEM one (TN, KT)/(KT, MT) panel at a time, so arbitrary production
    m/k fit; k is innermost so each output tile stays VMEM-resident
    across its accumulation (Pallas revisiting)."""
    n_pad, k_pad = idx_pad.shape
    m_pad = a_t_pad.shape[1]
    kt = min(kt_max, k_pad)
    mt = min(mt_max, m_pad)
    grid_spec = pl.GridSpec(
        grid=(n_pad // tn, m_pad // mt, k_pad // kt),
        in_specs=[
            pl.BlockSpec((tn, kt), lambda i, j, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, mt), lambda i, j, c: (c, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, mt), lambda i, j, c: (i, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _cb_kernel,
            tn=tn,
            kt=kt,
            precision=_matmul_precision(a_t_pad.dtype),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(idx_pad, table_lo, table_hi, a_t_pad)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.custom_vjp
def codebook_matmul(a, b_t: CodebookDense):
    """``A @ B`` with ``b_t`` storing B^T as a CodebookDense (n, k).

    Padding: k to a multiple of 128 with sentinel indices (dequant → 0,
    and A^T pad rows are zero anyway); n to a multiple of _TN; the table to
    256 slots (extra slots are zero, so out-of-table indices stay zeros —
    the reference's own convention, sparse-matrix.cc:44).

    Differentiable w.r.t. ``a`` (custom VJP: the backward pass dequantizes
    B once via the XLA LUT gather — a cold path — and contracts
    ``dC @ B^T``); the integer codebook indices carry no gradient.
    """
    return _codebook_matmul_impl(a, b_t)


def _codebook_matmul_impl(a, b_t: CodebookDense):
    n, k = b_t.shape
    m = a.shape[0]
    tn, kt_max, mt_max = _TN, _KT, _MT
    # k tiles at KT when large; m is padded to the full 128-row MXU even
    # for the reference's m=117 (pad rows of A^T are zero → pad C columns
    # are zero and sliced away)
    k_pad = _round_up(k, kt_max if k > kt_max else _LANES)
    n_pad = _round_up(n, tn)
    m_pad = _round_up(max(m, _LANES), mt_max if m > mt_max else _LANES)
    ts = b_t.table_size
    # int8 plane: modular truncation of the uint8 index (sentinel ts maps
    # to a zero table slot either way)
    idx_pad = jnp.full((n_pad, k_pad), np.int8(np.uint8(ts).view(np.int8)),
                       dtype=jnp.int8)
    idx_pad = idx_pad.at[:n, :k].set(
        jax.lax.bitcast_convert_type(
            b_t.idx.astype(jnp.uint8), jnp.int8))
    table256 = jnp.zeros((256,), b_t.val_table.dtype)
    table256 = table256.at[: ts + 1].set(b_t.val_table)
    table_lo = jnp.broadcast_to(table256[:_LANES], (8, _LANES))
    table_hi = jnp.broadcast_to(table256[_LANES:], (8, _LANES))
    a_t_pad = jnp.zeros((k_pad, m_pad), a.dtype).at[:k, :m].set(a.T)
    out = _cb_call(idx_pad, table_lo, table_hi, a_t_pad,
                   interpret=config.interpret(), tn=tn, kt_max=kt_max,
                   mt_max=mt_max)
    return out[:n, :m].astype(a.dtype).T  # (m, n)


def _cb_mm_fwd(a, b_t):
    return _codebook_matmul_impl(a, b_t), b_t


def _cb_mm_bwd(b_t, dC):
    # dA = dC @ B^T; B^T = dequant(b_t) — one LUT gather on the cold path
    import jax

    bt_dense = b_t.todense()  # (n, k)
    precision = _matmul_precision(dC.dtype)
    dA = jnp.dot(dC, bt_dense, preferred_element_type=dC.dtype,
                 precision=precision)
    db = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating)
        else None,
        b_t,
    )
    return dA, db


codebook_matmul.defvjp(_cb_mm_fwd, _cb_mm_bwd)
