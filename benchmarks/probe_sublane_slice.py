"""Probe: per-sublane (1,128) dynamic slices of x at ARBITRARY sublane
offsets — the gate for multi-window "pooled" dual-gather slabs (each
sublane picks its own global chunk, so tail entries from different
windows can share a slab).

P1: does Mosaic compile 8 x_ref[pl.ds(c_u, 1), :] slices + concatenate?
P2: numerics vs oracle.
P3: per-slab cost vs the aligned-window dual-gather step.

Run: timeout 570 python benchmarks/probe_sublane_slice.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def pooled_kernel(ptr_ref, idxA_ref, idxB_ref, vals_ref, x_ref, o_ref, *,
                  group: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jnp.zeros((8, LANES), jnp.float32)
    for b in range(group):
        rows = [
            x_ref[pl.ds(ptr_ref[(g * group + b) * 8 + u], 1), :]
            for u in range(8)
        ]
        xw = jnp.concatenate(rows, axis=0)  # (8, 128): per-sublane chunks
        iA = idxA_ref[0, b * 8:(b + 1) * 8, :]
        iB = idxB_ref[0, b * 8:(b + 1) * 8, :]
        t1 = jnp.take_along_axis(xw, iA, axis=0)
        gth = jnp.take_along_axis(t1, iB, axis=1)
        acc = acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth
    o_ref[0:1, :] = o_ref[0:1, :] + jnp.sum(acc, 0, keepdims=True).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def pooled_call(ptr, idxA, idxB, vals, xp, *, group):
    n_groups = idxA.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, LANES), lambda g, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, LANES), lambda g, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, LANES), lambda g, p: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda g, p: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(pooled_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )(ptr.reshape(-1), idxA, idxB, vals, xp)


def oracle(ptr, idxA, idxB, vals, xp):
    n_groups, GH, _ = idxA.shape
    group = GH // 8
    out = np.zeros((LANES,), np.float64)
    for g in range(n_groups):
        for b in range(group):
            xw = xp[ptr[g, b]]  # (8, 128) from 8 arbitrary chunk rows
            t1 = np.take_along_axis(xw, idxA[g, b * 8:(b + 1) * 8], axis=0)
            gth = np.take_along_axis(t1, idxB[g, b * 8:(b + 1) * 8], axis=1)
            out += (vals[g, b * 8:(b + 1) * 8].astype(np.float64)
                    * gth.astype(np.float64)).sum(axis=0)
    return out


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    S = 256
    group, n_groups = 8, 4
    ptr = rng.integers(0, S, (n_groups, group, 8)).astype(np.int32)
    idxA = rng.integers(0, 8, (n_groups, group * 8, LANES)).astype(np.int8)
    idxB = rng.integers(0, LANES, (n_groups, group * 8, LANES)).astype(np.int8)
    vals = rng.normal(size=(n_groups, group * 8, LANES)).astype(np.float32)
    xp = rng.normal(size=(S, LANES)).astype(np.float32)

    t0 = time.time()
    out = np.asarray(pooled_call(jnp.asarray(ptr), jnp.asarray(idxA),
                                 jnp.asarray(idxB), jnp.asarray(vals),
                                 jnp.asarray(xp), group=group))
    print(f"P1 compile+run OK in {time.time()-t0:.1f}s")
    ref = oracle(ptr, idxA, idxB, vals, xp)
    err = np.abs(out[0] - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"P2 max rel err vs oracle: {err:.2e}")
    assert err < 1e-4, "MISMATCH"
    print("PASS")


if __name__ == "__main__":
    main()
