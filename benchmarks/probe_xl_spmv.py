"""Probe: why is the XL (16.6M-nnz) rowlane SpMV 6x off its DMA pace?

At 2M nnz the kernel runs at ~6.9 ns/slab == the DMA bound for its
164 KB/step stream; at 16.6M nnz the measured 1.43 ms works out to
~42 ns/slab (~120 GB/s).  This script separates the candidate causes:

  * session speed (relay variance, TODO_ROUND3 #4): calibration rows
  * group size (128 at XL vs 32 at large)
  * the spill tail's separate kernel launches
  * per-call chunking (_MAX_GROUPS_PER_CALL)

Emits one JSON line per row to stdout + benchmarks/probe_xl_spmv.json.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_rowlane import (
    SellRowLane,
    pack_sell_rowlane,
    spmv_sell_rowlane,
)
from sparsematrix_tpu.utils.timer import bench_fn_slope

import dataclasses

OUT = []


def emit(row):
    OUT.append(row)
    print(json.dumps(row), flush=True)
    with open("/root/repo/benchmarks/probe_xl_spmv.json", "w") as f:
        json.dump(OUT, f, indent=1)


def calibrate():
    d = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2048, 2048)),
                    jnp.float32)
    f = jax.jit(lambda a: jnp.dot(a, a))
    r = bench_fn_slope(f, d, iters=6)
    emit({"name": "calibrate/matmul-2048", "min_ms": r.min_ms,
          "tflops": 2 * 2048**3 / (r.min_ms * 1e-3) / 1e12})
    big = jnp.arange(64 * 2**20, dtype=jnp.float32)
    f = jax.jit(lambda a: a * 1.0001)
    r = bench_fn_slope(f, big, iters=6)
    emit({"name": "calibrate/hbm-stream", "min_ms": r.min_ms,
          "gb_s": 2 * big.size * 4 / (r.min_ms * 1e-3) / 1e9})


def build(n=32768, nnz_row=512):
    g = np.random.default_rng(9)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g.integers(0, n, n * nnz_row)
    data_ = g.uniform(-1000, 1000, n * nnz_row).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    return CSR.from_scipy(sp), sp


def strip_spill(p: SellRowLane) -> SellRowLane:
    return dataclasses.replace(p, spill=None, spill_packed=None)


def variant_kernels(packed: SellRowLane):
    """Same grid/blocks as the real kernel, with pieces removed — isolates
    DMA stream vs gather vs dynamic window slice cost (same-session A/B)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    group = packed.group
    n_tiles = packed.n_tiles
    _LANES = 128

    def mk(body):
        def kern(tile_ref, win_ref, sidx_ref, vals_ref, x_ref, o_ref):
            g = pl.program_id(0)

            @pl.when(jnp.logical_or(g == 0, tile_ref[g] != tile_ref[g - 1]))
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            acc = jnp.zeros((8, _LANES), jnp.float32)
            for b in range(group):
                acc = body(acc, g, b, win_ref, sidx_ref, vals_ref, x_ref)
            o_ref[0:1, :] = (o_ref[0:1, :]
                             + jnp.sum(acc, axis=0, keepdims=True)
                             .astype(o_ref.dtype))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(packed.s_idx.shape[0],),
            in_specs=[
                pl.BlockSpec((1, group * 8, _LANES),
                             lambda g, t, w: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, group * 8, _LANES),
                             lambda g, t, w: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, _LANES), lambda g, t, w: (t[g], 0),
                                   memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_tiles * 8, _LANES),
                                           jnp.float32))

        def run(p, xp):
            return call(p.group_tile, p.slab_win.reshape(-1), p.s_idx,
                        p.vals, xp)

        return jax.jit(run)

    def dma_only(acc, g, b, win_ref, sidx_ref, vals_ref, x_ref):
        # touch vals only — s_idx still streams (pallas DMAs every
        # in_spec block per grid step whether read or not)
        return acc + vals_ref[0, b * 8:(b + 1) * 8, :]

    def fixed_window(acc, g, b, win_ref, sidx_ref, vals_ref, x_ref):
        # gather from window 0 (no dynamic slice, no win_ref scalar read)
        xw = x_ref[0:8, :]
        gth = jnp.take_along_axis(xw, sidx_ref[0, b * 8:(b + 1) * 8, :],
                                  axis=1)
        return acc + vals_ref[0, b * 8:(b + 1) * 8, :] * gth

    def slice_no_gather(acc, g, b, win_ref, sidx_ref, vals_ref, x_ref):
        w = win_ref[g * group + b]
        xw = x_ref[pl.ds(pl.multiple_of(w * 8, 8), 8), :]
        return acc + vals_ref[0, b * 8:(b + 1) * 8, :] * xw

    return {"dma-only": mk(dma_only), "fixed-window": mk(fixed_window),
            "slice-no-gather": mk(slice_no_gather)}


def probe_variants(packed: SellRowLane, xj):
    S = packed.n_win * 8
    xp = (jnp.zeros((S * 128,), xj.dtype).at[: xj.shape[0]].set(xj)
          .reshape(S, 128))
    n_slabs = int(np.prod(packed.vals.shape[:2])) // 8
    itm = packed.vals.dtype.itemsize
    main_bytes = packed.vals.size * (itm + 1)
    for tag, fn in variant_kernels(packed).items():
        res = bench_fn_slope(fn, strip_spill(packed), xp, iters=6)
        emit({"name": f"probe_xl/variant-{tag}", "min_ms": res.min_ms,
              "ns_per_slab": res.min_ms * 1e6 / n_slabs,
              "gb_s": main_bytes / (res.min_ms * 1e-3) / 1e9})


def main():
    calibrate()
    A, sp = build()
    n = sp.shape[0]
    x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    want = sp.astype(np.float64) @ x
    f = jax.jit(lambda p, v: spmv_sell_rowlane(p, v))
    configs = [
        ("fp32-g128", dict(group=128)),
        ("fp32-g32", dict(group=32)),
        ("fp32-g128-sp4", dict(group=128, spill_depth=4)),
        ("fp32-g32-sp4", dict(group=32, spill_depth=4)),
        ("bf16-g32-sp4", dict(group=32, spill_depth=4,
                              dtype=jnp.bfloat16)),
    ]
    for tag, kws in configs:
        t0 = time.time()
        packed = pack_sell_rowlane(A, **kws)
        pack_s = time.time() - t0
        got = np.asarray(f(packed, xj))
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
        ok = bool(np.mean(rel < 0.1) > 0.999)
        res = bench_fn_slope(f, packed, xj, iters=6)
        n_slabs = int(np.prod(packed.vals.shape[:2])) // 8
        itm = packed.vals.dtype.itemsize
        main_bytes = packed.vals.size * (itm + 1)
        tail_slabs = 0
        tail_bytes = 0
        row = {
            "name": f"probe_xl/{tag}", "min_ms": res.min_ms, "ok": ok,
            "fill": round(packed.fill_rate, 4), "group": packed.group,
            "pack_s": round(pack_s, 1), "n_slabs": n_slabs,
            "ns_per_slab": res.min_ms * 1e6 / n_slabs,
            "gb_s": main_bytes / (res.min_ms * 1e-3) / 1e9,
        }
        if packed.spill_packed is not None:
            spk = packed.spill_packed
            tail_slabs = int(np.prod(spk.vals.shape[:2])) // 8
            main_only = strip_spill(packed)
            r_main = bench_fn_slope(f, main_only, xj, iters=6)
            r_tail = bench_fn_slope(f, spk, xj, iters=6)
            row.update(
                main_ms=r_main.min_ms, tail_ms=r_tail.min_ms,
                tail_slabs=tail_slabs, tail_group=spk.group,
                tail_fill=round(spk.fill_rate, 4),
                spill_nnz=packed.spill.nnz,
                main_gb_s=main_bytes / (r_main.min_ms * 1e-3) / 1e9,
            )
        emit(row)
        if tag == "fp32-g128":
            probe_variants(packed, xj)


if __name__ == "__main__":
    main()
