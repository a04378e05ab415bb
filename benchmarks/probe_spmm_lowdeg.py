"""Probe: low-degree XL SpMM formulations (nnz/row=2, n=32768, k=32).

walk-kt1 sits at ~10 % SoL (fill 0.01 → VPU-bound on slabs×k); can the
ELL row-gather (X[cols] rows are 128-byte contiguous runs) beat it?

Run: timeout 570 python benchmarks/probe_spmm_lowdeg.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sparsematrix_tpu.formats import CSR, ELL
from sparsematrix_tpu.formats.convert import csr_to_ell
from sparsematrix_tpu.ops.spmm import _spmm_ell_jnp
from sparsematrix_tpu.utils.testutils import relative_check
from sparsematrix_tpu.utils.timer import bench_fn_slope

n, k = 32768, 32
mode = sys.argv[1] if len(sys.argv) > 1 else "fixed2"
g = np.random.default_rng(12)
if mode == "fixed2":
    rows_ = np.repeat(np.arange(n), 2)
    cols_ = g.integers(0, n, rows_.size)
    data_ = g.uniform(-1, 1, rows_.size).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
elif mode == "poisson2":
    sp = sps.random(n, n, density=2.0 / n, random_state=3, format="csr",
                    dtype=np.float32)
    sp.data = g.uniform(-1, 1, sp.nnz).astype(np.float32)
else:  # poisson8
    sp = sps.random(n, n, density=8.0 / n, random_state=3, format="csr",
                    dtype=np.float32)
    sp.data = g.uniform(-1, 1, sp.nnz).astype(np.float32)
sp.sum_duplicates()
A = CSR.from_scipy(sp)
E, _perm = csr_to_ell(A)
X = jnp.asarray(g.uniform(-1, 1, (n, k)), np.float32)
want = sp.astype(np.float64) @ np.asarray(X, np.float64)

f = jax.jit(lambda e, x: _spmm_ell_jnp(e, x))
got = np.asarray(f(E, X))
ok = relative_check(got, want)
res = bench_fn_slope(f, E, X, iters=6, perturb_max_bytes=1 << 20)
print(f"{mode} ell-rowgather width={E.cols.shape[1]} {res.min_ms:7.3f} ms "
      f"check={ok}", flush=True)

from sparsematrix_tpu.ops.spmm_lowdeg import (pack_sliced_ell,
                                              spmm_sliced_ell)

pk = pack_sliced_ell(A)
fs = jax.jit(spmm_sliced_ell)
got = np.asarray(fs(pk, X))
ok = relative_check(got, want)
res = bench_fn_slope(fs, pk, X, iters=6, perturb_max_bytes=1 << 20)
print(f"{mode} sliced-ell segs={len(pk.vals)} "
      f"widths={[v.shape[1] for v in pk.vals]} fill={pk.fill_rate:.2f} "
      f"{res.min_ms:7.3f} ms check={ok}", flush=True)
