"""Distributed SpMV on the dual-gather Pallas kernel.

Same composition as ``dist_spmv_rowlane`` (row partition + all_gather RHS
over ICI + packed local kernel) but with the measured-best unstructured
layout as the local compute (dual-gather: fp32 55.1 vs rowlane 34.5
Gnnz/s on the XL point — BASELINE.md csr_spmv_xl), so the distributed
path inherits the round-3 single-chip throughput.

Each shard's row band is packed independently (``pack_dualgather`` with a
fixed ``group`` and k_tiles=1 — the per-tile grid whose padding contract
matches the stacking: padding groups repeat the band's LAST tile id with
zero values, adding exactly 0 to an already-materialized tile), then the
packs are stacked on a leading shard axis (the ``PartitionedCSR``
stacked-pytree convention).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..formats.base import register_sparse_pytree
from ..formats.csr import CSR

__all__ = ["PartitionedDualGather", "partition_dualgather",
           "dist_spmv_dualgather", "dist_spmm_dualgather"]

_LANES = 128


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class PartitionedDualGather:
    idxA: jnp.ndarray  # (n_shards, n_groups, group*8, 128) int8
    idxB: jnp.ndarray  # (n_shards, n_groups, group*8, 128) int8
    vals: jnp.ndarray  # (n_shards, n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_shards, n_groups) int32
    slab_win: jnp.ndarray  # (n_shards, n_groups, group) int32
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_shards: int = dataclasses.field(metadata={"static": True})
    band_rows: int = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})


def partition_dualgather(csr: CSR, n_shards: int, group: int = 32,
                         dtype=None) -> PartitionedDualGather:
    """Row-partition and dual-gather-pack each band (host)."""
    import scipy.sparse as sps

    from ..kernels.spmv_dualgather import pack_dualgather

    sp = csr.to_scipy().tocsr()
    rows, cols = sp.shape
    band = -(-rows // n_shards)
    band = -(-band // _LANES) * _LANES  # full tiles per shard
    packs = []
    for s in range(n_shards):
        lo, hi = s * band, min((s + 1) * band, rows)
        local = sp[lo:hi] if lo < rows else sp[0:0]
        local = sps.csr_matrix(local, shape=(max(hi - lo, 0), cols))
        local.resize((band, cols))
        p = pack_dualgather(CSR.from_scipy(local), group=group, k_tiles=1,
                            dtype=dtype)
        assert p.k_tiles == 1 and p.tail is None and not p.splits
        packs.append(p)
    n_groups = max(p.idxA.shape[0] for p in packs)
    gh = group * 8
    ia = np.zeros((n_shards, n_groups, gh, _LANES), np.int8)
    ib = np.zeros((n_shards, n_groups, gh, _LANES), np.int8)
    va = np.zeros((n_shards, n_groups, gh, _LANES),
                  np.asarray(packs[0].vals).dtype)
    gt = np.zeros((n_shards, n_groups), np.int32)
    sw = np.zeros((n_shards, n_groups, group), np.int32)
    for s, p in enumerate(packs):
        g = p.idxA.shape[0]
        ia[s, :g] = np.asarray(p.idxA)
        ib[s, :g] = np.asarray(p.idxB)
        va[s, :g] = np.asarray(p.vals)
        gt[s, :g] = np.asarray(p.group_tile)
        gt[s, g:] = gt[s, g - 1] if g else 0  # no reset boundary
        sw[s, :g] = np.asarray(p.slab_win)
    return PartitionedDualGather(
        idxA=jnp.asarray(ia), idxB=jnp.asarray(ib), vals=jnp.asarray(va),
        group_tile=jnp.asarray(gt), slab_win=jnp.asarray(sw),
        shape=(rows, cols), n_shards=n_shards, band_rows=band,
        n_tiles=packs[0].n_tiles, n_win=packs[0].n_win, group=group,
        nnz=csr.nnz,
    )


def _local_dg(part: PartitionedDualGather, p_local, cols: int):
    from ..kernels.spmv_dualgather import DualGather

    return DualGather(
        idxA=p_local.idxA[0], idxB=p_local.idxB[0], vals=p_local.vals[0],
        group_tile=p_local.group_tile[0], slab_win=p_local.slab_win[0],
        slab_tloc=None, commit=None, tail=None, t_pack=None,
        shape=(part.band_rows, cols), n_tiles=part.n_tiles,
        n_win=part.n_win, group=part.group, k_tiles=1, nnz=0,
    )


def dist_spmv_dualgather(part: PartitionedDualGather, x, mesh: Mesh,
                         axis_name: str = "shard"):
    """``y = A @ x``, row-sharded output; dual-gather local compute,
    RHS all-gathered over ICI."""
    from ..kernels.spmv_dualgather import spmv_dualgather

    rows, cols = part.shape
    n = part.n_shards
    xb = -(-cols // n)
    x_pad = jnp.zeros((n * xb,), x.dtype).at[:cols].set(x)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,  # per-shard-pure pallas (dist_spmv_rowlane stance)
    )
    def run(p_local, x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)[:cols]
        return spmv_dualgather(_local_dg(part, p_local, cols), x_full)

    y = run(part, x_pad)
    return y.reshape(-1)[:rows]


def dist_spmm_dualgather(part: PartitionedDualGather, X, mesh: Mesh,
                         axis_name: str = "shard"):
    """``Y = A @ X``, row-sharded output, dual-gather multi-RHS walk as the
    local compute (``spmm_dualgather`` — 2.2x the rowlane walk at the
    low-density multi-RHS point, BASELINE.md spmm_csr), RHS panel
    all-gathered over ICI.

    X is (n, k) dense, k <= 64 (the walk's regime; above that densify
    bands via ``dist_spmm_dense`` win).  Output Y is (m, k) sharded over
    rows.
    """
    from ..kernels.spmm_dualgather import spmm_dualgather

    rows, cols = part.shape
    n = part.n_shards
    k = X.shape[1]
    xb = -(-cols // n)
    X_pad = jnp.zeros((n * xb, k), X.dtype).at[:cols].set(X)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,  # per-shard-pure pallas (dist_spmv_rowlane stance)
    )
    def run(p_local, X_local):
        X_full = jax.lax.all_gather(X_local, axis_name, tiled=True,
                                    axis=0)[:cols]
        return spmm_dualgather(_local_dg(part, p_local, cols), X_full)

    Y = run(part, X_pad)
    return Y[:rows]
