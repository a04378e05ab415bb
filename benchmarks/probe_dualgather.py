"""Probe: does Mosaic compile the dual-gather SpMV inner loop?

Round-3 SpMV layout candidate (see DESIGN.md): per slab,
  t1[u, cl] = xw[idxA[u, cl], cl]     -- take_along_axis axis=0, (8,128)
  out[u, l] = t1[u, idxB[u, l]]       -- take_along_axis axis=1, (8,128)
  acc += vals * out; one sublane sum closes the step.

Questions this probe answers on real TPU hardware:
  P1  chained axis-0 + axis-1 take_along_axis in one kernel compiles?
  P2  numeric correctness vs numpy oracle
  P3  per-slab cost vs the single-gather rowlane step (timing at scale)

Run: timeout 570 python benchmarks/probe_dualgather.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def dual_kernel(win_ref, idxA_ref, idxB_ref, vals_ref, x_ref, o_ref, *,
                group: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jnp.zeros((8, LANES), jnp.float32)
    for b in range(group):
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        idxA = idxA_ref[0, b * 8:(b + 1) * 8, :]
        idxB = idxB_ref[0, b * 8:(b + 1) * 8, :]
        t1 = jnp.take_along_axis(xw, idxA, axis=0)      # chunk select
        gth = jnp.take_along_axis(t1, idxB, axis=1)     # lane route
        acc = acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth
    part = jnp.sum(acc, axis=0, keepdims=True)
    o_ref[0:1, :] = o_ref[0:1, :] + part.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group",))
def dual_call(win, idxA, idxB, vals, xp, *, group):
    n_groups = idxA.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, group * 8, LANES), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, LANES), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * 8, LANES), lambda g, w: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda g, w: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(dual_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )(win.reshape(-1), idxA, idxB, vals, xp)


def oracle(win, idxA, idxB, vals, xp):
    n_groups, GH, _ = idxA.shape
    group = GH // 8
    out = np.zeros((LANES,), np.float64)
    for g in range(n_groups):
        for b in range(group):
            w = int(win[g, b])
            xw = xp[w * 8:(w + 1) * 8, :]
            t1 = np.take_along_axis(xw, idxA[g, b * 8:(b + 1) * 8], axis=0)
            gth = np.take_along_axis(t1, idxB[g, b * 8:(b + 1) * 8], axis=1)
            out += (vals[g, b * 8:(b + 1) * 8].astype(np.float64)
                    * gth.astype(np.float64)).sum(axis=0)
    return out


def bench_slope(fn, n_lo=20, n_hi=60, reps=12):
    """min-of-reps slope timing of an in-graph loop."""
    def loop(n):
        @jax.jit
        def f(x):
            def body(i, acc):
                return acc + fn(x + i * 1e-7)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((8, LANES)))
        return f
    flo, fhi = loop(n_lo), loop(n_hi)
    x0 = jnp.ones((64, LANES), jnp.float32)
    flo(x0).block_until_ready(); fhi(x0).block_until_ready()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); flo(x0).block_until_ready()
        t1 = time.perf_counter(); fhi(x0).block_until_ready()
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    return best


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    S = 64  # 8 windows of x
    group = 8
    n_groups = 4
    win = rng.integers(0, S // 8, (n_groups, group)).astype(np.int32)
    idxA = rng.integers(0, 8, (n_groups, group * 8, LANES)).astype(np.int8)
    idxB = rng.integers(0, LANES, (n_groups, group * 8, LANES)).astype(np.int8)
    vals = rng.normal(size=(n_groups, group * 8, LANES)).astype(np.float32)
    xp = rng.normal(size=(S, LANES)).astype(np.float32)

    t0 = time.time()
    out = dual_call(jnp.asarray(win), jnp.asarray(idxA), jnp.asarray(idxB),
                    jnp.asarray(vals), jnp.asarray(xp), group=group)
    out = np.asarray(out)
    print(f"P1 compile+run OK in {time.time()-t0:.1f}s")
    ref = oracle(win, idxA, idxB, vals, xp)
    err = np.abs(out[0] - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"P2 max rel err vs oracle: {err:.2e}")
    assert err < 1e-4, "MISMATCH"

    # P3: per-slab cost, dual vs single gather, at a realistic group size
    group = 64
    n_groups = 16
    win = rng.integers(0, S // 8, (n_groups, group)).astype(np.int32)
    idxA = rng.integers(0, 8, (n_groups, group * 8, LANES)).astype(np.int8)
    idxB = rng.integers(0, LANES, (n_groups, group * 8, LANES)).astype(np.int8)
    vals = rng.normal(size=(n_groups, group * 8, LANES)).astype(np.float32)
    winj, iAj, iBj, vj = map(jnp.asarray, (win, idxA, idxB, vals))

    t_dual = bench_slope(lambda x: dual_call(winj, iAj, iBj, vj, x,
                                             group=group))
    n_slabs = n_groups * group
    print(f"P3 dual-gather: {t_dual*1e6:.1f} us/call, "
          f"{t_dual/n_slabs*1e9:.2f} ns/slab")

    def single_kernel(win_ref, idxB_ref, vals_ref, x_ref, o_ref, *, group):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros((8, LANES), jnp.float32)
        for b in range(group):
            w = win_ref[g * group + b]
            xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
            idxB = idxB_ref[0, b * 8:(b + 1) * 8, :]
            gth = jnp.take_along_axis(xw, idxB, axis=1)
            acc = acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth
        o_ref[0:1, :] = o_ref[0:1, :] + jnp.sum(acc, 0, keepdims=True).astype(
            o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("group",))
    def single_call(win, idxB, vals, xp, *, group):
        n_groups = idxB.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((1, group * 8, LANES), lambda g, w: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, group * 8, LANES), lambda g, w: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda g, w: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(single_kernel, group=group),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        )(win.reshape(-1), idxB, vals, xp)

    t_single = bench_slope(lambda x: single_call(winj, iBj, vj, x,
                                                 group=group))
    print(f"P3 single-gather: {t_single*1e6:.1f} us/call, "
          f"{t_single/n_slabs*1e9:.2f} ns/slab")
    print(json.dumps({"dual_ns_per_slab": t_dual / n_slabs * 1e9,
                      "single_ns_per_slab": t_single / n_slabs * 1e9,
                      "ratio": t_dual / max(t_single, 1e-12)}))


if __name__ == "__main__":
    main()
