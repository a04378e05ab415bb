"""Distributed SpMV on the row-lane Pallas kernel.

``dist_spmv`` (dist_ops.py) runs a plain XLA gather+segment_sum as each
device's local compute — correct, but ~500× off the packed kernel.  This
module composes the north-star pieces: 1-D row partition, RHS all-gather
over ICI, and the **row-lane slab kernel as the local compute**, so the
distributed path inherits single-chip kernel throughput.

Representation: each shard's row band is packed independently
(``pack_sell_rowlane``), then the packs are equalized (same ``group``,
rows padded to full 128-row tiles, slab groups padded to the max shard)
and stacked on a leading shard axis — the same stacked-pytree convention
as ``PartitionedCSR``.  Padding groups point at each shard's LAST tile id
with zero values: no output-reset boundary is introduced and they
accumulate exactly 0 (the sentinel-zero stance,
/root/reference/src/sparse/sparse-matrix.cc:29-31).
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

__all__ = ["PartitionedRowLane", "partition_rowlane", "dist_spmv_rowlane",
           "dist_spmm_rowlane"]

_LANES = 128


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class PartitionedRowLane:
    s_idx: jnp.ndarray  # (n_shards, n_groups, group*8, 128) int8
    vals: jnp.ndarray  # (n_shards, n_groups, group*8, 128)
    group_tile: jnp.ndarray  # (n_shards, n_groups) int32
    slab_win: jnp.ndarray  # (n_shards, n_groups, group) int32
    tile_nonempty: jnp.ndarray  # (n_shards, n_tiles) bool
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_shards: int = dataclasses.field(metadata={"static": True})
    band_rows: int = dataclasses.field(metadata={"static": True})
    n_tiles: int = dataclasses.field(metadata={"static": True})
    n_win: int = dataclasses.field(metadata={"static": True})
    group: int = dataclasses.field(metadata={"static": True})
    lanes_per_row: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})


def partition_rowlane(csr: CSR, n_shards: int, group: int = 32,
                      dtype=None) -> PartitionedRowLane:
    """Row-partition and pack each band for the row-lane kernel (host)."""
    from ..kernels.spmv_rowlane import pack_sell_rowlane

    sp = csr.to_scipy().tocsr()
    rows, cols = sp.shape
    band = -(-rows // n_shards)
    band = -(-band // _LANES) * _LANES  # full tiles per shard
    packs = []
    for s in range(n_shards):
        lo, hi = s * band, min((s + 1) * band, rows)
        local = sp[lo:hi] if lo < rows else sp[0:0]
        import scipy.sparse as sps

        local = sps.csr_matrix(local, shape=(max(hi - lo, 0), cols))
        local.resize((band, cols))
        packs.append(pack_sell_rowlane(CSR.from_scipy(local), group=group,
                                       dtype=dtype))
    n_groups = max(p.s_idx.shape[0] for p in packs)
    gh = group * 8
    si = np.zeros((n_shards, n_groups, gh, _LANES), np.int8)
    va = np.zeros((n_shards, n_groups, gh, _LANES),
                  np.asarray(packs[0].vals).dtype)
    gt = np.zeros((n_shards, n_groups), np.int32)
    sw = np.zeros((n_shards, n_groups, group), np.int32)
    tne = np.zeros((n_shards, packs[0].n_tiles), bool)
    for s, p in enumerate(packs):
        assert p.group == group and p.spill is None
        g = p.s_idx.shape[0]
        si[s, :g] = np.asarray(p.s_idx)
        va[s, :g] = np.asarray(p.vals)
        gt[s, :g] = np.asarray(p.group_tile)
        # padding groups: same tile as the last real group (no reset
        # boundary; zero values accumulate nothing)
        gt[s, g:] = gt[s, g - 1] if g else 0
        sw[s, :g] = np.asarray(p.slab_win)
        tne[s] = np.asarray(p.tile_nonempty)
    return PartitionedRowLane(
        s_idx=jnp.asarray(si),
        vals=jnp.asarray(va),
        group_tile=jnp.asarray(gt),
        slab_win=jnp.asarray(sw),
        tile_nonempty=jnp.asarray(tne),
        shape=(rows, cols),
        n_shards=n_shards,
        band_rows=band,
        n_tiles=packs[0].n_tiles,
        n_win=packs[0].n_win,
        group=group,
        lanes_per_row=1,
        nnz=csr.nnz,
    )


def dist_spmv_rowlane(part: PartitionedRowLane, x, mesh: Mesh,
                      axis_name: str = "shard"):
    """``y = A @ x``, row-sharded output; local compute on the Pallas
    kernel, RHS all-gathered over ICI."""
    from ..kernels.spmv_rowlane import SellRowLane, spmv_sell_rowlane

    rows, cols = part.shape
    n = part.n_shards
    xb = -(-cols // n)
    x_pad = jnp.zeros((n * xb,), x.dtype).at[:cols].set(x)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # the kernel is per-shard pure so the vma check is safely skipped
        check_vma=False,
    )
    def run(p_local, x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)[:cols]
        return spmv_sell_rowlane(_local_sell(part, p_local, cols), x_full)

    y = run(part, x_pad)
    return y.reshape(-1)[:rows]


def _local_sell(part: PartitionedRowLane, p_local, cols: int):
    """Reconstruct the per-shard SellRowLane from a shard_map slice."""
    from ..kernels.spmv_rowlane import SellRowLane

    return SellRowLane(
        s_idx=p_local.s_idx[0],
        vals=p_local.vals[0],
        group_tile=p_local.group_tile[0],
        slab_win=p_local.slab_win[0],
        tile_nonempty=p_local.tile_nonempty[0],
        spill=None,
        spill_packed=None,
        t_pack=None,
        shape=(part.band_rows, cols),
        n_tiles=part.n_tiles,
        n_win=part.n_win,
        group=part.group,
        lanes_per_row=part.lanes_per_row,
        nnz=0,
    )


def dist_spmm_rowlane(part: PartitionedRowLane, X, mesh: Mesh,
                      axis_name: str = "shard"):
    """``Y = A @ X`` (k dense RHS columns) with the row-lane SpMM kernel
    as each device's local compute — the low-density multi-RHS composition
    (``spmm_rowlane`` walks the slabs once per column, so per-MAC cost
    matches the SpMV kernel; the measured-best path for d < 5 %, k ≤ 64).
    X is row-sharded and all-gathered over ICI, Y lands row-sharded."""
    from ..kernels.spmm_rowlane import spmm_rowlane

    rows, cols = part.shape
    n = part.n_shards
    xb = -(-cols // n)
    k = X.shape[1]
    Xp = jnp.zeros((n * xb, k), X.dtype).at[: X.shape[0]].set(X)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None)),
        out_specs=P(axis_name, None),
        check_vma=False,  # same rationale as dist_spmv_rowlane
    )
    def run(p_local, X_local):
        X_full = jax.lax.all_gather(X_local, axis_name, tiled=True)[:cols]
        return spmm_rowlane(_local_sell(part, p_local, cols), X_full)

    Y = run(part, Xp)
    return Y[:rows]
