"""Probe: superblock multi-RHS dual-gather walk at XL (sparse-regime SpMM).

The regime analysis (TODO_ROUND5 item 2): pre-dense bf16 streams the
whole densified A per apply (n²·2 bytes), so at huge n and low density
the walk's slab bytes (~9 B/nnz at fill 0.62) win on memory while the
VPU gather count (2-3 per nnz·col) sets the compute bound.  Expected
crossover: walk wins when nnz/row is low (d ≲ 0.002) and k moderate.

Variants: k_tiles=1 pack (the n=2048 winner), superblock kt8 single-win,
superblock kt8 two-win (the SpMV fp32 record layout — but the mm walk is
gather-bound, so two-win's extra gather may lose like bf16 SpMV did).

Run: timeout 570 python benchmarks/probe_spmm_sb.py [nnz_row] [k]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather
from sparsematrix_tpu.kernels.spmm_dualgather import spmm_dualgather
from sparsematrix_tpu.utils.timer import bench_chain_slope

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n = 32768
nnz_row = int(sys.argv[1]) if len(sys.argv) > 1 else 64
k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
print(f"n={n} nnz/row={nnz_row} k={k}", flush=True)

rng = np.random.default_rng(0)
d = nnz_row / n
sp = sps.random(n, n, density=d, random_state=5, format="csr",
                dtype=np.float32)
sp.data = rng.uniform(-1, 1, sp.nnz).astype(np.float32)
A = CSR.from_scipy(sp)
X = jnp.asarray(rng.uniform(-1, 1, (n, k)), np.float32)
want = sp.astype(np.float64) @ np.asarray(X, np.float64)
alpha = np.float32(1.0 / max(nnz_row, 1))

packs = {}
t0 = time.time()
packs["kt1"] = pack_dualgather(A, k_tiles=1)
print(f"pack kt1: {time.time()-t0:.1f}s fill={packs['kt1'].fill_rate:.3f}",
      flush=True)
t0 = time.time()
packs["sb8"] = pack_dualgather(A, k_tiles=8, group=128)
print(f"pack sb8: {time.time()-t0:.1f}s fill={packs['sb8'].fill_rate:.3f}",
      flush=True)
t0 = time.time()
packs["sb8tw"] = pack_dualgather(A, k_tiles=8, group=128, two_win=True)
print(f"pack sb8tw: {time.time()-t0:.1f}s "
      f"fill={packs['sb8tw'].fill_rate:.3f}", flush=True)

nnz = sp.nnz
for name, pk in packs.items():
    try:
        f = jax.jit(lambda y, q: spmm_dualgather(q, y) * alpha)
        got = np.asarray(f(X, pk)) / alpha
        err = np.max(np.abs(got - want) / (np.abs(want) + 1.0))
        r = bench_chain_slope(lambda y, q: spmm_dualgather(q, y) * alpha,
                              X, pk, inner_lo=4, inner_hi=20, iters=6)
        g = nnz / (r.min_ms * 1e6)
        print(f"{name:7s} {r.min_ms:8.3f} ms  {g:6.2f} Gnnz/s  "
              f"{g*k:7.1f} Gmac/s  err={err:.2e}  "
              f"unreliable={r.extras['unreliable']}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)

# pre-dense bf16 race (the streaming-bound alternative)
ad = jnp.asarray(sp.toarray(), jnp.bfloat16)
fd = jax.jit(lambda a, y: (a @ y.astype(jnp.bfloat16)).astype(
    jnp.float32) * alpha)
r = bench_chain_slope(lambda y, a: fd(a, y), X, ad,
                      inner_lo=4, inner_hi=20, iters=6)
g = nnz / (r.min_ms * 1e6)
print(f"pre-dense-bf16 {r.min_ms:8.3f} ms  {g:6.2f} Gnnz/s  "
      f"{g*k:7.1f} Gmac/s  unreliable={r.extras['unreliable']}", flush=True)
