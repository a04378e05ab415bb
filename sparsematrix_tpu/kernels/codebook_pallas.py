"""Fused codebook-dequantize + GEMM Pallas kernel.

The reference's headline op is ``C = beta*C + alpha * A @ B`` with B
codebook-quantized (AddMatMat, /root/reference/src/sparse/sparse-matrix.cc:140).
Its CPU kernel streams (delta, idx) pairs and does scalar AXPYs
(kernel.cc:771-800).  The TPU-native formulation here:

  * B is stored transposed as a dense uint8 index plane (``CodebookDense``,
    1 byte/element) — HBM traffic is 4× below fp32 and there is no
    delta-decode on the hot path.
  * Dequantization happens **inside the kernel** via Mosaic's lane-wise
    ``dynamic_gather``: the 256-entry table is broadcast to (TN, 256) and
    each 256-column chunk of indices gathers its values with
    ``take_along_axis(table_bcast, idx_chunk, axis=1)`` — a single VPU
    gather per chunk, no scatter, no dense B materialized in HBM.
  * Each dequantized (TN, 256) chunk feeds the MXU immediately:
    ``acc += chunk @ A^T[chunk_range]``.

Computes C^T tiles (grid over n); the final transpose is an XLA layout
choice, not a data movement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import config
from ..formats import CodebookDense
from .spmm_pallas import _matmul_precision

__all__ = ["codebook_matmul"]

_CHUNK = 256  # table gather width (the full 256-slot codebook)


def _cb_kernel(idx_ref, table_ref, at_ref, o_ref, *, k_chunks: int, precision):
    tn = o_ref.shape[0]
    table_b = jnp.broadcast_to(table_ref[0, :], (tn, _CHUNK))
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for c in range(k_chunks):
        idx_c = idx_ref[:, c * _CHUNK : (c + 1) * _CHUNK].astype(jnp.int32)
        vals = jnp.take_along_axis(table_b, idx_c, axis=1)  # (TN, 256)
        acc = acc + jnp.dot(
            vals,
            at_ref[pl.ds(c * _CHUNK, _CHUNK), :],
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tn", "interpret"))
def _cb_call(idx_pad, table256, a_t_pad, *, tn: int, interpret: bool):
    n_pad, k_pad = idx_pad.shape
    m = a_t_pad.shape[1]
    k_chunks = k_pad // _CHUNK
    grid_spec = pl.GridSpec(
        grid=(n_pad // tn,),
        in_specs=[
            pl.BlockSpec((tn, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _cb_kernel,
            k_chunks=k_chunks,
            precision=_matmul_precision(a_t_pad.dtype),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, m), a_t_pad.dtype),
        interpret=interpret,
    )(idx_pad, table256, a_t_pad)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def codebook_matmul(a, b_t: CodebookDense, tn: int = 128):
    """``A @ B`` with ``b_t`` storing B^T as a CodebookDense (n, k).

    Padding: k to a multiple of 256 with sentinel indices (dequant → 0, and
    A^T pad rows are zero anyway); n to a multiple of ``tn``; the table to
    256 slots (extra slots are zero, so out-of-table indices stay zeros —
    the reference's own convention, sparse-matrix.cc:44).
    """
    n, k = b_t.shape
    m = a.shape[0]
    k_pad = _round_up(k, _CHUNK)
    n_pad = _round_up(n, tn)
    ts = b_t.table_size
    idx_pad = jnp.full((n_pad, k_pad), ts, dtype=jnp.uint8)
    idx_pad = idx_pad.at[:n, :k].set(b_t.idx)
    table256 = jnp.zeros((1, _CHUNK), b_t.val_table.dtype)
    table256 = table256.at[0, : ts + 1].set(b_t.val_table)
    a_t_pad = jnp.zeros((k_pad, m), a.dtype).at[:k].set(a.T)
    out = _cb_call(idx_pad, table256, a_t_pad, tn=tn,
                   interpret=config.interpret())
    return out[:n].T  # (m, n)
