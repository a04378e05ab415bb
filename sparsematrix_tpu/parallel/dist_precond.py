"""Per-shard block preconditioning for the distributed Krylov solvers.

Block-Jacobi with *real* incomplete factorizations: each shard owns the
IC(0)/ILU(0) factors of its local diagonal block ``A_ii`` and applies the
exact wave solves (kernels/trisolve_waves.py) to its residual band — no
collectives, the classic distributed block preconditioner, but with the
local solve running at MXU speed instead of a level scan.

Plans are built on the host per shard, validated to share one static
layout, and their array leaves stacked along a leading shard axis; the
solvers shard that state pytree over the mesh axis so each device slices
out exactly its own factors (``ShardedPrecond`` protocol, handled by
``dist_cg``/``dist_bicgstab``/``dist_gmres``).

No reference counterpart (the reference is single-node with no solver
layer, SURVEY §2.4) — this is north-star composition: partition once,
factor locally, iterate globally.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np

from ..formats.csr import CSR

__all__ = ["ShardedPrecond", "block_ic0_precond", "block_ilu0_precond"]


@dataclasses.dataclass(frozen=True)
class ShardedPrecond:
    """A preconditioner whose state is sharded over the solve mesh.

    ``state``: pytree whose array leaves are stacked (n_shards, ...);
    the dist solvers pass it through shard_map with P(axis) on the
    leading axis.  ``fn(r_local, state_local) -> z_local`` sees leaves
    sliced to (1, ...).
    """

    state: Any
    fn: Callable


def _local_block(sp, r0, lr, n):
    import scipy.sparse as sps

    real = min(n - r0, lr)
    blk = sp[r0:r0 + real, r0:r0 + real].tocoo()
    if real == lr:
        return blk.tocsr()
    # padding rows on the last shard: unit diagonal keeps factors exact
    pad = np.arange(real, lr)
    r = np.concatenate([blk.row, pad])
    c = np.concatenate([blk.col, pad])
    v = np.concatenate([blk.data, np.ones(lr - real, blk.data.dtype)])
    return sps.coo_matrix((v, (r, c)), shape=(lr, lr)).tocsr()


def _stack_plans(plans):
    treedefs = {jax.tree_util.tree_structure(p) for p in plans}
    if len(treedefs) != 1:
        raise ValueError(
            "per-shard plans disagree on static layout (level/slab "
            "structure differs across shards) — equal local-block "
            "structure is required to stack them; consider engine="
            "'fixpoint' or padding the partition")
    shapes = [tuple(x.shape for x in jax.tree_util.tree_leaves(p))
              for p in plans]
    if len(set(shapes)) != 1:
        raise ValueError("per-shard plan arrays disagree in shape — "
                         "cannot stack across shards")
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *plans)


def _block_factor_precond(A: CSR, n_shards: int, factor: str,
                          engine: str, **plan_kwargs) -> ShardedPrecond:
    sp = A.to_scipy().tocsr()
    n = sp.shape[0]
    lr = -(-n // n_shards)
    plans = []
    for s in range(n_shards):
        blk = CSR.from_scipy(_local_block(sp, s * lr, lr, n))
        if factor == "ic0":
            if engine == "waves":
                from ..ops.ichol import ic0_waves_plans

                plans.append(ic0_waves_plans(blk, **plan_kwargs))
            else:
                from ..ops.ichol import ic0_fixpoint_plans

                plans.append(ic0_fixpoint_plans(blk, **plan_kwargs))
        else:
            if engine == "waves":
                from ..ops.ilu import ilu0_waves_plans

                plans.append(ilu0_waves_plans(blk, **plan_kwargs))
            else:
                from ..ops.ilu import ilu0_fixpoint_plans

                plans.append(ilu0_fixpoint_plans(blk, **plan_kwargs))
    state = _stack_plans(plans)

    def fn(r_local, state_local):
        from ..ops.ilu import ilu_apply

        local = jax.tree_util.tree_map(lambda x: x[0], state_local)
        return ilu_apply(local, r_local)

    return ShardedPrecond(state=state, fn=fn)


def block_ic0_precond(A: CSR, n_shards: int, engine: str = "waves",
                      **plan_kwargs) -> ShardedPrecond:
    """IC(0) of each shard's diagonal block, exact wave solves per apply.

    ``engine``: "waves" (host-inverted block solves) or "fixpoint"
    (truncated-Neumann SpMV solves; pass ``n_iters=``).
    """
    return _block_factor_precond(A, n_shards, "ic0", engine, **plan_kwargs)


def block_ilu0_precond(A: CSR, n_shards: int, engine: str = "waves",
                       **plan_kwargs) -> ShardedPrecond:
    """ILU(0) of each shard's diagonal block (nonsymmetric systems)."""
    return _block_factor_precond(A, n_shards, "ilu0", engine,
                                 **plan_kwargs)
