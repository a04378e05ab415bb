"""Probe: decompose the XL octet csc apply — kernel vs b-permute vs glue.

Run: timeout 570 python benchmarks/probe_octet2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops.permute import apply_permutation
from sparsematrix_tpu.ops.spgemm import spgemm_plan_packed
from sparsematrix_tpu.kernels.spmv_octet import spmv_octet
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
pp = spgemm_plan_packed(A, B, layout="octet", group=32, k_octets=64)
pk = pp.p_packed
print("groups:", pk.pos.shape[0], "fill:", round(pk.fill_rate, 3),
      flush=True)

# 1) b-permute alone
fb = jax.jit(lambda q, bd: apply_permutation(q, bd))
res = bench_fn_slope(fb, pp.b_perm, B.data, iters=6,
                     perturb_max_bytes=1 << 20)
print(f"b-permute: {res.min_ms:.3f} ms (use_sort={pp.b_perm.use_sort})",
      flush=True)

# 2) kernel alone on the pre-permuted x
x = fb(pp.b_perm, B.data)
fk = jax.jit(lambda q, xx: spmv_octet(q, xx))
res = bench_fn_slope(fk, pk, x, iters=6, perturb_max_bytes=1 << 20)
print(f"octet kernel: {res.min_ms:.3f} ms", flush=True)

# 3) y -> c_data copy
y = fk(pk, x)
cap = pp.ct_indices.shape[0]
fc = jax.jit(lambda yy: jnp.zeros((cap,), yy.dtype)
             .at[: pp.c_nnz].set(yy[: pp.c_nnz]))
res = bench_fn_slope(fc, y, iters=6)
print(f"c-copy: {res.min_ms:.3f} ms", flush=True)
