"""Probe: octet vs dual-gather on the CLUSTERED low-degree structure.

The round-4 auto rule (nnz <= 2*rows -> octet) captured the structure of
tests/test_spmv_superblock.py::test_prepare_spmv_auto_clustered_dualgather
(65536 rows, 80k nnz, every entry in one 1024-col window).  That test
codified dual-gather group>2 as measured-best; this probe settles the
routing with an on-chip measurement of both layouts on the test's exact
generator, plus a SCATTERED control at the same degree (cols uniform over
the full width) where octet was measured-best in round 4.

Run (one case per invocation — each fresh kernel compile is 2-5 min
through the remote-compile tunnel):
  timeout 570 python benchmarks/probe_route_clustered.py <structure> <layout>
structures: clustered-1win scattered clustered-4win
layouts: dualgather dualgather-g128 octet
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.utils.timer import bench_fn_slope

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(tag, n, nnz, col_hi):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, n, size=nnz)
    cols = rng.integers(0, col_hi, size=rows.size)
    vals = rng.uniform(-1, 1, rows.size).astype(np.float32)
    d = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    d.sum_duplicates()
    return tag, CSR.from_scipy(d), d


n = 512 * 128
col_hi = {"clustered-1win": 1024, "scattered": n, "clustered-4win": 4096}

from sparsematrix_tpu.kernels.spmv_dualgather import pack_dualgather
from sparsematrix_tpu.kernels.spmv_octet import pack_octet
from sparsematrix_tpu.ops.spmv import spmv

packers = {
    "dualgather": lambda A: pack_dualgather(A, k_tiles=8, two_win=True),
    "dualgather-g128": lambda A: pack_dualgather(A, k_tiles=8,
                                                 two_win=True, group=128),
    "octet": pack_octet,
}

tag, lay = sys.argv[1], sys.argv[2]
tag, A, d = build(tag, n, 80_000, col_hi[tag])
x = np.random.default_rng(1).uniform(-1, 1, n).astype(np.float32)
xj = jnp.asarray(x)
want = d.astype(np.float64) @ x
try:
    t0 = time.time()
    p = packers[lay](A)
    pack_s = time.time() - t0
    f = jax.jit(spmv)
    y = np.asarray(f(p, xj))
    err = np.max(np.abs(y - want)) / max(np.max(np.abs(want)), 1)
    res = bench_fn_slope(f, p, xj, iters=6)
    g = A.nnz / res.min_ms / 1e6
    print(f"{tag:15s} {lay:20s} {res.min_ms*1e3:8.1f} us  "
          f"{g:6.2f} Gnnz/s  fill={p.fill_rate:.3f} "
          f"pack={pack_s:.1f}s  relerr={err:.2e}", flush=True)
except Exception as e:
    print(f"{tag:15s} {lay:20s} FAILED {type(e).__name__}: "
          f"{str(e)[:200]}", flush=True)
