"""Halo-exchange distributed SpMV for banded/local structure.

When each shard's rows only touch columns within ``halo`` of its own x
band (banded matrices, local stencils), the full ``all_gather`` of the RHS
is wasteful: each device only needs its own band plus a halo from its two
ring neighbors.  This implements that exchange with ``jax.lax.ppermute``
(ICI neighbor traffic, O(halo) instead of O(n) per device) — the
"halo segments of the x-vector exchanged over ICI" capability of the
north star (BASELINE.json).

The partitioner verifies the locality assumption at build time and rebases
column indices into the (halo | own band | halo) local frame.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..formats.base import default_index_dtype, register_sparse_pytree
from ..formats.csr import CSR

__all__ = ["HaloPartitionedCSR", "partition_csr_halo", "dist_spmv_halo"]


@register_sparse_pytree
@dataclasses.dataclass(frozen=True)
class HaloPartitionedCSR:
    indices: jnp.ndarray  # (n_shards, cap) local col ids in halo frame
    data: jnp.ndarray  # (n_shards, cap)
    row_ids: jnp.ndarray  # (n_shards, cap) local rows (pad → local_rows)
    shape: Tuple[int, int] = dataclasses.field(metadata={"static": True})
    n_shards: int = dataclasses.field(metadata={"static": True})
    local_rows: int = dataclasses.field(metadata={"static": True})
    band: int = dataclasses.field(metadata={"static": True})  # x per shard
    halo: int = dataclasses.field(metadata={"static": True})
    nnz: int = dataclasses.field(metadata={"static": True})


def partition_csr_halo(csr: CSR, n_shards: int, halo: int) -> HaloPartitionedCSR:
    """Row-partition with halo-local column rebasing.

    Raises if any entry reaches beyond ``halo`` columns outside its shard's
    own x band (use the all-gather path for such matrices).
    """
    sp = csr.to_scipy().tocsr()
    rows, cols = sp.shape
    local_rows = -(-rows // n_shards)
    band = -(-cols // n_shards)
    if halo > band:
        raise ValueError(f"halo {halo} larger than band {band}")
    caps = []
    shards = []
    for s in range(n_shards):
        r0, r1 = s * local_rows, min((s + 1) * local_rows, rows)
        sub = sp[r0:r1]
        c0 = s * band
        lo, hi = c0 - halo, c0 + band + halo
        if sub.nnz:
            cmin, cmax = int(sub.indices.min()), int(sub.indices.max())
            if cmin < lo or cmax >= hi:
                raise ValueError(
                    f"shard {s}: columns [{cmin}, {cmax}] exceed halo window "
                    f"[{lo}, {hi}) — matrix is not {halo}-local"
                )
        caps.append(int(sub.nnz))
        shards.append((r0, sub, lo))
    cap = max(max(caps), 1)
    n_idx = np.zeros((n_shards, cap), np.int64)
    n_dat = np.zeros((n_shards, cap), sp.data.dtype)
    n_rid = np.full((n_shards, cap), local_rows, np.int64)
    for s, (r0, sub, lo) in enumerate(shards):
        k = int(sub.nnz)
        n_idx[s, :k] = sub.indices - lo  # halo-frame local columns
        n_dat[s, :k] = sub.data
        n_rid[s, :k] = np.repeat(np.arange(sub.shape[0]), np.diff(sub.indptr))
    idt = default_index_dtype
    return HaloPartitionedCSR(
        indices=jnp.asarray(n_idx, idt),
        data=jnp.asarray(n_dat),
        row_ids=jnp.asarray(n_rid, idt),
        shape=(rows, cols),
        n_shards=n_shards,
        local_rows=local_rows,
        band=band,
        halo=halo,
        nnz=csr.nnz,
    )


def shard_halo(part: HaloPartitionedCSR, mesh: Mesh, axis_name: str = "shard"):
    spec = NamedSharding(mesh, P(axis_name))
    return dataclasses.replace(
        part,
        indices=jax.device_put(part.indices, spec),
        data=jax.device_put(part.data, spec),
        row_ids=jax.device_put(part.row_ids, spec),
    )


def dist_spmv_halo(part: HaloPartitionedCSR, x, mesh: Mesh,
                   axis_name: str = "shard"):
    """``y = A @ x`` exchanging only O(halo) per neighbor via ppermute."""
    n = part.n_shards
    h = part.halo
    band = part.band
    x_pad = jnp.zeros((n * band,), x.dtype).at[: x.shape[0]].set(x)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    def run(indices, data, row_ids, x_local):
        # send band edges to ring neighbors (wrap links carry zeros
        # logically, since edge shards have no out-of-range entries)
        right_halo_src = x_local[-h:]  # to right neighbor's left halo
        left_halo_src = x_local[:h]  # to left neighbor's right halo
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_left = jax.lax.ppermute(right_halo_src, axis_name, fwd)
        from_right = jax.lax.ppermute(left_halo_src, axis_name, bwd)
        x_frame = jnp.concatenate([from_left, x_local, from_right])
        prod = data[0] * x_frame[indices[0]]
        return jax.ops.segment_sum(prod, row_ids[0],
                                   num_segments=part.local_rows)

    y = run(part.indices, part.data, part.row_ids, x_pad)
    return y.reshape(-1)[: part.shape[0]]
