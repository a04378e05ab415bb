"""Probe: octet vs superblock pair-program layouts at the XL SpGEMM point.

Run: timeout 570 python benchmarks/probe_octet.py
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
from sparsematrix_tpu.utils.testutils import relative_check
from sparsematrix_tpu.utils.timer import bench_fn_slope

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, density = 16384, 0.001
rng = np.random.default_rng(7)
sa = sps.random(n, n, density=density, random_state=7, format="csr",
                dtype=np.float32)
sb = sps.random(n, n, density=density, random_state=8, format="csr",
                dtype=np.float32)
sa.data = rng.uniform(-1000, 1000, sa.nnz).astype(np.float32)
sb.data = rng.uniform(-1000, 1000, sb.nnz).astype(np.float32)
A, B = CSR.from_scipy(sa), CSR.from_scipy(sb)
want = (sa.astype(np.float64) @ sb.astype(np.float64)).T.tocsr()
want.sort_indices()

cases = [
    ("superblock", dict(layout="superblock")),
    ("octet-g8-k32", dict(layout="octet", group=8, k_octets=32)),
    ("octet-g16-k64", dict(layout="octet", group=16, k_octets=64)),
    ("octet-g32-k64", dict(layout="octet", group=32, k_octets=64)),
]
for tag, kw in cases:
    try:
        t0 = time.time()
        pp = spgemm_plan_packed(A, B, **kw)
        pack_s = time.time() - t0
        fill = pp.p_packed.fill_rate
        pl0 = getattr(pp.p_packed, "idxA", getattr(pp.p_packed, "pos", None))
        groups = pl0.shape[0] if pl0 is not None else -1
        f = jax.jit(lambda q, bd: spgemm_apply_packed_csc(q, bd).data)
        got = np.asarray(f(pp, B.data))
        ok = relative_check(got[: pp.c_nnz], want.data)
        res = bench_fn_slope(f, pp, B.data, iters=6,
                             perturb_max_bytes=1 << 20)
        print(f"{tag:14s} {res.min_ms:7.3f} ms  fill={fill:.3f} "
              f"groups={groups}  pack={pack_s:.1f}s  check={ok}",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)
