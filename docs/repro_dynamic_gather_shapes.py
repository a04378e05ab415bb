"""Minimized repro: Pallas `jnp.take_along_axis` (Mosaic dynamic_gather)
only compiles at the native (8, 128) vreg tile on TPU v5e.

Run manually on TPU (NOT in the test suite — the failing cases crash the
remote compiler with an HTTP 500 that kills the session):

    python docs/repro_dynamic_gather_shapes.py            # good case only
    python docs/repro_dynamic_gather_shapes.py --crash    # include crashers

Environment of record: jax 0.9.0, TPU v5 lite via axon remote compile.
"""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def run(tab_shape, idx_shape):
    tab = jnp.arange(tab_shape[0] * tab_shape[1], dtype=jnp.float32).reshape(tab_shape)
    idx = jnp.zeros(idx_shape, jnp.int32)
    out = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    return jax.block_until_ready(out)


if __name__ == "__main__":
    print("backend:", jax.default_backend())

    # GOOD: idx shape == operand shape == (8, 128), axis=1.
    run((8, 128), (8, 128))
    print("(8,128) axis=1 gather: OK")

    if "--crash" in sys.argv:
        # Each of these crashes the remote Mosaic compiler (HTTP 500).
        for shape in [(16, 128), (8, 256), (32, 128)]:
            print(f"attempting {shape} ... (expect remote-compile crash)")
            run(shape, shape)
    else:
        print("crash cases skipped (pass --crash to attempt them; they kill "
              "the axon session)")
