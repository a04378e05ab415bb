"""Probe: Clos-routed permutation vs sort-network vs gather, on-chip.

Run (one size per invocation):
  timeout 570 python benchmarks/probe_permute_clos.py <n> [paths]
paths: comma list of clos,sort,gather (default clos,sort)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrix_tpu.ops.permute import (apply_permutation,
                                          plan_gather_permutation)
from sparsematrix_tpu.ops.permute_clos import (apply_clos_permutation,
                                               plan_clos_permutation)
from sparsematrix_tpu.utils.timer import bench_fn_slope

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n = int(sys.argv[1])
paths = (sys.argv[2] if len(sys.argv) > 2 else "clos,sort").split(",")
rng = np.random.default_rng(0)
g = rng.permutation(n)
x = rng.uniform(-10, 10, n).astype(np.float32)
xj = jnp.asarray(x)
want = x[g]

for path in paths:
    try:
        t0 = time.time()
        if path == "clos":
            plan = plan_clos_permutation(g, n_src=n)
            f = jax.jit(lambda p, v: apply_clos_permutation(p, v))
        else:
            plan = plan_gather_permutation(g, n_src=n,
                                           force_sort=(path == "sort"))
            f = jax.jit(apply_permutation)
        plan_s = time.time() - t0
        got = np.asarray(f(plan, xj))
        ok = bool((got == want).all())
        res = bench_fn_slope(f, plan, xj, iters=6)
        ns = res.min_ms * 1e6 / n
        print(f"n={n:9d} {path:7s} {res.min_ms*1e3:9.1f} us  "
              f"{ns:6.3f} ns/elem  plan={plan_s:.1f}s  exact={ok}",
              flush=True)
    except Exception as e:
        print(f"n={n:9d} {path:7s} FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
