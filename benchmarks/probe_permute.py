"""Probe: fastest way to apply a known permutation to a device vector.

The SpGEMM CSR-output path pays ``y[c_gather]`` — an arbitrary c_nnz
gather (~6.7 ns/element, 28 ms at 4.2 M).  Candidates (chained-slope
timed — a plain full-fetch measurement is relay-dominated at 16 MB):

  a) plain gather   x[perm]                    (the status quo)
  b) sort_key_val   lax.sort_key_val(inv, x)   (TPU sort network)
  c) scatter        zeros.at[inv].set(x)       (the dual of (a))

The permutation is known at pack time, so any winner can be planned
host-side.  Run on TPU: `timeout 570 python benchmarks/probe_permute.py`.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrix_tpu.utils.timer import bench_chain_slope

print("devices:", jax.devices())

for nnz in (65_536, 131_072, 262_144, 524_288, 1_048_576):
    rng = np.random.default_rng(0)
    perm = rng.permutation(nnz)
    inv = np.empty(nnz, np.int64)
    inv[perm] = np.arange(nnz)
    x = jnp.asarray(rng.standard_normal(nnz), jnp.float32)
    permd = jnp.asarray(perm, jnp.int32)
    invd = jnp.asarray(inv, jnp.int32)

    r_g = bench_chain_slope(lambda y, p, i: y[p], x, permd, invd)
    r_s = bench_chain_slope(
        lambda y, p, i: jax.lax.sort_key_val(i, y)[1], x, permd, invd)
    r_c = bench_chain_slope(
        lambda y, p, i: jnp.zeros_like(y).at[i].set(y), x, permd, invd)

    ok_s = np.allclose(
        np.asarray(jax.jit(lambda y, i: jax.lax.sort_key_val(i, y)[1]
                           )(x, invd)),
        np.asarray(x)[perm])
    print(f"nnz={nnz:9d}  gather {r_g.min_ms:8.3f} ms "
          f"({r_g.min_ms/nnz*1e6:5.2f} ns/el)   "
          f"sort {r_s.min_ms:8.3f} ms (ok={ok_s})   "
          f"scatter {r_c.min_ms:8.3f} ms   "
          f"unreliable={r_g.extras['unreliable']}"
          f"/{r_s.extras['unreliable']}/{r_c.extras['unreliable']}")
