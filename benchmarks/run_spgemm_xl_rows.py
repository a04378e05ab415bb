"""Focused spgemm_xl re-measure: superblock CSR + CSC rows only (the full
bench group's two plans + dense races exceed one 570 s relay session).
Emits bench-compatible rows to benchmarks/pass_r4c1.json for merging."""
import json
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
from sparsematrix_tpu.utils.roofline import speed_of_light_nnz_s
from sparsematrix_tpu.utils.testutils import relative_check
from sparsematrix_tpu.utils.timer import bench_fn_slope

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
pack_s = time.time() - t0
n_pairs = pp.p_packed.nnz
sol = speed_of_light_nnz_s(n_pairs,
                           n_pairs * (2 * 4 + 3 * 4) + pp.c_nnz * 4)
rows = []
for name, fn, oracle in (
        ("spgemm_xl/superblock", spgemm_apply_packed, want),
        ("spgemm_xl/superblock-csc", spgemm_apply_packed_csc, wantT)):
    f = jax.jit(lambda q, bd, _fn=fn: _fn(q, bd).data)
    got = np.asarray(f(pp, B.data))
    ok = relative_check(got[: pp.c_nnz], oracle.data)
    res = bench_fn_slope(f, pp, B.data, iters=6, perturb_max_bytes=1 << 20)
    gp = n_pairs / (res.min_ms * 1e-3) / 1e9
    rows.append({
        "name": name,
        "shape": f"n={n},d={density},pairs={n_pairs},"
                 f"fill={pp.p_packed.fill_rate:.2f}",
        "min_ms": res.min_ms, "mean_ms": res.mean_ms,
        "gnnz_per_s": gp, "sol_frac": gp * 1e9 / sol,
        "checked": bool(ok), "nnz": n_pairs,
        "extras": {"pack_seconds": pack_s, "c_nnz": pp.c_nnz},
    })
    print(f"{name}: {res.min_ms:.3f} ms check={ok}", flush=True)
with open("/root/repo/benchmarks/pass_r4c1.json", "w") as fh:
    json.dump(rows, fh, indent=1)
print("wrote pass_r4c1.json")
