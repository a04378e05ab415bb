"""Cross-check the calibrate hbm-stream row: chain-slope vs fn-slope on
the same pallas copy (three fresh r5 sessions gated at ~39% of spec
while clos-permute applies implied ~790 GB/s — one of the timers lies).

Run: timeout 570 python benchmarks/probe_calibrate_xcheck.py
"""
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sparsematrix_tpu.utils.timer import bench_chain_slope, bench_fn_slope

BR, STEPS = 2048, 128  # 1 MB blocks x 128 = 128 MB
copy_call = pl.pallas_call(
    lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
    grid=(STEPS,),
    in_specs=[pl.BlockSpec((BR, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BR, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((BR * STEPS, 128), jnp.float32),
)
rng = np.random.default_rng(0)
big = jnp.asarray(rng.standard_normal((BR * STEPS, 128)), jnp.float32)
nbytes = 2 * big.size * 4

res = bench_chain_slope(lambda y: copy_call(y), big, iters=6)
print(f"chain-slope: {res.min_ms:.3f} ms  "
      f"{nbytes/(res.min_ms*1e-3)/1e9:.0f} GB/s", flush=True)

f = jax.jit(lambda x: copy_call(x))
res2 = bench_fn_slope(f, big, iters=6, perturb_max_bytes=1 << 20)
print(f"fn-slope:    {res2.min_ms:.3f} ms  "
      f"{nbytes/(res2.min_ms*1e-3)/1e9:.0f} GB/s", flush=True)

# and a double-size chain to test slope linearity
big2 = jnp.asarray(rng.standard_normal((BR * STEPS * 2, 128)), jnp.float32)
copy2 = pl.pallas_call(
    lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:]),
    grid=(STEPS * 2,),
    in_specs=[pl.BlockSpec((BR, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((BR, 128), lambda g: (g, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((BR * STEPS * 2, 128), jnp.float32),
)
res3 = bench_chain_slope(lambda y: copy2(y), big2, iters=6)
print(f"chain-2x:    {res3.min_ms:.3f} ms  "
      f"{2*nbytes/(res3.min_ms*1e-3)/1e9:.0f} GB/s", flush=True)
