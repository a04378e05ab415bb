"""2-D mesh distributed SpMM: matrix rows × RHS columns.

A is row-partitioned over the ``row`` mesh axis (replicated over ``col``);
the dense RHS is sharded (rows over ``row`` for storage balance, columns
over ``col``).  Each device all-gathers its RHS column-panel over the
``row`` axis and runs the local CSR product — output lands sharded over
both axes with no reduction needed.  This is the standard 2-D
data-parallel layout for tall sparse × wide dense products.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .partition import PartitionedCSR

__all__ = ["make_mesh_2d", "dist_spmm_2d"]


def make_mesh_2d(n_row: int, n_col: int, axis_names=("row", "col")) -> Mesh:
    devs = jax.devices()[: n_row * n_col]
    import numpy as np

    return Mesh(np.array(devs).reshape(n_row, n_col), axis_names)


def dist_spmm_2d(part: PartitionedCSR, X, mesh: Mesh):
    """``Y = A @ X`` on a ('row','col') mesh.

    ``part`` must be row-partitioned with ``n_shards == mesh row size``.
    ``X`` (n, k): rows sharded over 'row', columns over 'col'.
    Returns Y (m, k) sharded (row, col).
    """
    n_row = mesh.shape["row"]
    n_col = mesh.shape["col"]
    if part.partition_axis != "rows" or part.n_shards != n_row:
        raise ValueError("need row partition matching the mesh 'row' axis")
    n = part.shape[1]
    k = X.shape[1]
    n_pad = n_row * (-(-n // n_row))
    k_pad = n_col * (-(-k // n_col))
    Xp = jnp.zeros((n_pad, k_pad), X.dtype).at[:n, :k].set(X)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("row"), P("row", "col")),
        out_specs=P("row", "col"),
    )
    def run(p_local, X_local):
        # assemble this device's full RHS column-panel over the row axis
        X_panel = jax.lax.all_gather(X_local, "row", tiled=True)
        X_panel = X_panel[: part.shape[1]]
        ip, ix, dd, rid = part.local_csr_arrays(p_local)
        gathered = X_panel[ix]
        contrib = dd[:, None] * gathered
        return jax.ops.segment_sum(contrib, rid,
                                   num_segments=part.local_rows)

    Y = run(part, Xp)
    return Y[: part.shape[0], :k]
