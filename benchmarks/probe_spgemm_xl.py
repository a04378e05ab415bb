"""XL packed-SpGEMM probe (round 4, VERDICT item 7).

Hypothesis: the 32.3 ms spgemm_xl/superblock row is dominated by the
4.2 M-element OUTPUT permutation gather (ypad[c_gather] — CLAUDE.md: an
arbitrary 65k gather costs ~440 us => ~6.7 ns/elem => ~28 ms here), not
by the pair-program kernel.  The CSC-output apply skips it entirely.

    timeout 570 python benchmarks/probe_spgemm_xl.py
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

sys.path.insert(0, "/root/repo")

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops.spgemm import (spgemm_apply_packed,
                                         spgemm_apply_packed_csc,
                                         spgemm_plan_packed)
from sparsematrix_tpu.utils.timer import bench_fn_slope
from sparsematrix_tpu.utils.testutils import relative_check

n, density = 16384, 0.001
rng = np.random.default_rng(7)
sa = sps.random(n, n, density=density, random_state=7, format="csr",
                dtype=np.float32)
sb = sps.random(n, n, density=density, random_state=8, format="csr",
                dtype=np.float32)
sa.data = rng.uniform(-1000, 1000, sa.nnz).astype(np.float32)
sb.data = rng.uniform(-1000, 1000, sb.nnz).astype(np.float32)
A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
want.sort_indices()
wantT = want.T.tocsr()
wantT.sort_indices()

t0 = time.time()
pp = spgemm_plan_packed(A, B, layout="superblock")
print(f"plan: {time.time()-t0:.0f}s pairs={pp.p_packed.nnz} "
      f"c_nnz={pp.c_nnz} fill={pp.p_packed.fill_rate:.3f}", flush=True)

for tag, fn, oracle in (
        ("csr-out", spgemm_apply_packed, want),
        ("csc-out", spgemm_apply_packed_csc, wantT)):
    f = jax.jit(lambda q, bd, _fn=fn: _fn(q, bd).data)
    got = np.asarray(f(pp, B.data))
    ok = relative_check(got[: pp.c_nnz], oracle.data)
    res = bench_fn_slope(f, pp, B.data, iters=6, perturb_max_bytes=1 << 20)
    prs = pp.p_packed.nnz / (res.min_ms * 1e-3) / 1e9
    print(f"{tag}: {res.min_ms:.3f} ms, {prs:.3f} Gpairs/s, check={ok}",
          flush=True)
