"""Minimized repro: 2-D scalar-prefetch (SMEM) arrays with a non-lane-width
second dim are unreliable on TPU v5e Mosaic — flatten to 1-D instead.

Run manually on TPU (NOT in the test suite — the failing configuration can
crash the remote compiler with an HTTP 500 that kills the session):

    python docs/repro_smem_lane_padding.py            # good 1-D pattern
    python docs/repro_smem_lane_padding.py --crash    # 2-D lane-padded case

The codebase's kernels therefore keep every scalar-prefetch operand 1-D and
index it as ``ref[i * cols + j]`` (see kernels/spmv_rowlane.py,
kernels/spmv_dualgather.py — ``_SMEM_PREFETCH_BUDGET`` chunking).

Environment of record: jax 0.9.0, TPU v5 lite via axon remote compile.
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 512, 6  # 6 ints of metadata per grid step — not a lane width


def kernel_1d(meta_ref, x_ref, out_ref):
    i = pl.program_id(0)
    base = meta_ref[i * COLS]  # flat 1-D indexing: the reliable pattern
    out_ref[:] = x_ref[:] * base.astype(jnp.float32)


def kernel_2d(meta_ref, x_ref, out_ref):
    i = pl.program_id(0)
    base = meta_ref[i, 0]  # 2-D SMEM prefetch: lane-padded, unreliable
    out_ref[:] = x_ref[:] * base.astype(jnp.float32)


def run(two_d: bool):
    meta = jnp.arange(ROWS * COLS, dtype=jnp.int32)
    if two_d:
        meta = meta.reshape(ROWS, COLS)
    x = jnp.ones((8, 128), jnp.float32)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ROWS,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel_2d if two_d else kernel_1d,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=grid,
    )(meta, x)
    return jax.block_until_ready(out)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run(two_d=False)
    print("1-D flat SMEM prefetch: OK")
    if "--crash" in sys.argv:
        print("attempting 2-D lane-padded prefetch ... (expect crash or "
              "silent padding reads at larger ROWS)")
        run(two_d=True)
    else:
        print("2-D case skipped (pass --crash to attempt; can kill the axon "
              "session at production sizes)")
