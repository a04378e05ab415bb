"""Distributed Krylov solve: CG over a row-partitioned CSR on a device mesh.

The reference has no solver or distributed layer (SURVEY §2.4); this is the
north-star composition: the WHOLE iteration lives inside one ``shard_map``
region, so per iteration the only communication is

  * one tiled ``all_gather`` of the search direction (the x-halo exchange
    riding ICI), and
  * two scalar ``psum``s: one for ``p·Ap`` and ONE stacked psum carrying
    both ``r·z`` and ``r·r`` (the convergence test reuses the carried
    ``r·r`` — no extra collective in ``cond``).

State (x, r, p, z) stays sharded by row band the entire solve — nothing
device-global ever materializes except the gathered direction vector, and
XLA overlaps the gather with the local SpMV's leading gathers.

Preconditioning is local-by-construction (block-diagonal): ``precond=
"jacobi"`` builds the inverse diagonal from the local band on device; a
callable receives the *local* residual band and must return a local band
(no collectives required — the classic distributed block preconditioner).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..solvers.krylov import SolveResult
from .dist_ops import _pad_vec
from .partition import PartitionedCSR

__all__ = ["dist_cg"]


def _local_diag_inv(ip, ix, dd, rid, local_rows, row0):
    """Inverse diagonal of the local row band (Jacobi), on device.

    A stored entry is diagonal iff its global column equals its global row
    (row partitioning keeps global column ids).  Padding entries carry
    ``rid == local_rows`` and are dropped by segment_sum's bounds.
    """
    is_diag = ix == (rid + row0)
    diag = jax.ops.segment_sum(
        jnp.where(is_diag, dd, 0.0), rid, num_segments=local_rows)
    safe = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    return jnp.where(jnp.abs(diag) > 1e-30, 1.0 / safe, 1.0)


def dist_cg(part: PartitionedCSR, b, mesh: Mesh, axis_name: str = "shard",
            precond: Union[None, str, Callable] = None,
            x0=None, tol: float = 1e-6, maxiter: int = 1000) -> SolveResult:
    """Conjugate gradients for SPD ``A`` row-partitioned over ``mesh``.

    Args:
      part: row-partitioned matrix (``partition_csr_rows``), sharded over
        ``mesh`` (see ``shard_partitioned``).
      b: global RHS (length = rows); padded & sharded internally.
      precond: ``None``, ``"jacobi"`` (local inverse diagonal), or a
        callable ``(r_local, shard_index) -> z_local`` applied per band.
      x0: optional global initial guess.
    Returns:
      SolveResult with the GLOBAL solution vector (sharded output,
      reassembled to length rows).
    """
    if part.partition_axis != "rows":
        raise ValueError("dist_cg requires a row-partitioned matrix")
    rows, cols = part.shape
    if rows != cols:
        raise ValueError(f"dist_cg requires a square (SPD) matrix, got "
                         f"{part.shape}")
    n = part.n_shards
    pad_len = n * part.local_rows
    b_pad = _pad_vec(b, pad_len)
    x0_pad = _pad_vec(x0, pad_len) if x0 is not None else jnp.zeros_like(b_pad)

    def _psum_dot(a, c):
        return jax.lax.psum(jnp.vdot(a, c), axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(), P()),
    )
    def run(p_local, b_local, x_local):
        ip, ix, dd, rid = part.local_csr_arrays(p_local)
        b_loc = b_local
        x_loc = x_local
        row0 = jax.lax.axis_index(axis_name) * part.local_rows

        if precond == "jacobi":
            dinv = _local_diag_inv(ip, ix, dd, rid, part.local_rows, row0)
            apply_M = lambda r: r * dinv
        elif callable(precond):
            apply_M = lambda r: precond(r, jax.lax.axis_index(axis_name))
        else:
            apply_M = lambda r: r

        def matvec(v_local):
            v_full = jax.lax.all_gather(v_local, axis_name, tiled=True)
            prod = dd * v_full[:cols][ix]
            return jax.ops.segment_sum(prod, rid,
                                       num_segments=part.local_rows)

        def _dots2(a, c, d, e):
            # both global dots in ONE collective (stacked scalar psum)
            return jax.lax.psum(
                jnp.stack([jnp.vdot(a, c), jnp.vdot(d, e)]), axis_name)

        r = b_loc - matvec(x_loc)
        z = apply_M(r)
        p = z
        rz, rr = _dots2(r, z, r, r)
        bnorm = jnp.sqrt(jnp.maximum(_psum_dot(b_loc, b_loc), 1e-60))

        def cond(state):
            x, r, p, rz, rr, k = state
            return jnp.logical_and(k < maxiter,
                                   jnp.sqrt(jnp.maximum(rr, 0.0)) / bnorm
                                   > tol)

        def body(state):
            x, r, p, rz, rr, k = state
            Ap = matvec(p)
            alpha = rz / jnp.maximum(_psum_dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = apply_M(r)
            rz_new, rr_new = _dots2(r, z, r, r)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return (x, r, p, rz_new, rr_new, k + 1)

        x_loc, r, p, rz, rr, k = jax.lax.while_loop(
            cond, body, (x_loc, r, p, rz, rr, 0))
        return x_loc, k, jnp.sqrt(jnp.maximum(rr, 0.0))

    x, iters, residual = run(part, b_pad, x0_pad)
    return SolveResult(x=x.reshape(-1)[:rows], iters=iters,
                       residual=residual)
