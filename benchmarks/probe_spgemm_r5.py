"""Probe: decompose the XL SpGEMM octet-csc row and sweep group/k_octets.

Hypothesis: 333 grid steps at ~1 us/step puts the 0.375 ms kernel near
grid-step-bound; larger groups should shrink it.  Also times the
b-permute alone to target the Clos replacement.

Run (one case per invocation):
  timeout 570 python benchmarks/probe_spgemm_r5.py <case>
cases: bperm g32k64 g64k64 g128k64 g128k128 g256k64
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops.spgemm import (spgemm_apply_packed_csc,
                                         spgemm_plan_packed)
from sparsematrix_tpu.ops.permute import apply_permutation
from sparsematrix_tpu.kernels.spmv_octet import spmv_octet
from sparsematrix_tpu.utils.testutils import relative_check
from sparsematrix_tpu.utils.timer import bench_fn_slope

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

case = sys.argv[1]
n, density = 16384, 0.001
rng = np.random.default_rng(7)
sa = sps.random(n, n, density=density, random_state=7, format="csr",
                dtype=np.float32)
sb = sps.random(n, n, density=density, random_state=8, format="csr",
                dtype=np.float32)
sa.data = rng.uniform(-1000, 1000, sa.nnz).astype(np.float32)
sb.data = rng.uniform(-1000, 1000, sb.nnz).astype(np.float32)
A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)

cfg = {"g16k64": (16, 64), "g32k64": (32, 64), "g64k64": (64, 64),
       "g128k64": (128, 64), "g128k128": (128, 128),
       "g256k64": (256, 64),
       # trim variants: remainder slabs regrouped at the finer size
       "g32k64t8": (32, 64, 8), "g32k64t16": (32, 64, 16)}

if case == "csr32":
    # CSR-output e2e: the c-permute (c_nnz ~4.36M) now ships as Clos
    # planes (q=5) instead of the ~6-11 ms sort
    from sparsematrix_tpu.ops.spgemm import spgemm_apply_packed

    want = (sa.astype(np.float64) @ sb.astype(np.float64)).tocsr()
    want.sort_indices()
    t0 = time.time()
    pp = spgemm_plan_packed(A, B, layout="octet", group=32, k_octets=64)
    pack_s = time.time() - t0
    f = jax.jit(lambda q, bd: spgemm_apply_packed(q, bd).data)
    got = np.asarray(f(pp, B.data))
    ok = relative_check(got[: pp.c_nnz], want.data)
    res = bench_fn_slope(f, pp, B.data, iters=6,
                         perturb_max_bytes=1 << 20)
    print(f"csr32 e2e={res.min_ms:7.3f} ms  pack={pack_s:.1f}s  "
          f"check={ok}", flush=True)
elif case == "bperm":
    pp = spgemm_plan_packed(A, B, layout="octet", group=32, k_octets=64)
    f = jax.jit(lambda q, bd: apply_permutation(q.b_perm, bd))
    _ = np.asarray(f(pp, B.data))
    res = bench_fn_slope(f, pp, B.data, iters=6)
    ncap = pp.b_perm.cap
    print(f"bperm cap={ncap} {res.min_ms*1e3:9.1f} us "
          f"{res.min_ms*1e6/ncap:.3f} ns/elem", flush=True)
else:
    g, k, *trim = cfg[case]
    trim = trim[0] if trim else None
    want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
    want.sort_indices()
    t0 = time.time()
    pp = spgemm_plan_packed(A, B, layout="octet", group=g, k_octets=k,
                            trim_group=trim)
    pack_s = time.time() - t0
    pk = pp.p_packed
    groups = pk.pos.shape[0]
    if pk.rem is not None:
        groups = (groups, pk.rem.pos.shape[0])
    # end-to-end csc
    f = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
    got = np.asarray(f(pp, B.data))
    ok = relative_check(got[: pp.c_nnz], want.data)
    res = bench_fn_slope(f, pp, B.data, iters=6,
                         perturb_max_bytes=1 << 20)
    # kernel alone (pre-permuted x)
    xpre = apply_permutation(pp.b_perm, B.data)
    fk = jax.jit(spmv_octet)
    _ = np.asarray(fk(pk, xpre))
    resk = bench_fn_slope(fk, pk, xpre, iters=6,
                          perturb_max_bytes=1 << 20)
    print(f"{case:9s} e2e={res.min_ms:7.3f} ms  kern={resk.min_ms:7.3f} ms"
          f"  fill={pk.fill_rate:.3f} groups={groups} splits={pk.splits}"
          f"  pack={pack_s:.1f}s  check={ok}", flush=True)
