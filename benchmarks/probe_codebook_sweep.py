"""Final codebook fused-kernel VMEM config sweep (VERDICT r3 item 9):
keep the kernel if any (tn, kt, mt) beats the XLA fused dequant at the
reference shape; else formally deprecate.

    timeout 570 python benchmarks/probe_codebook_sweep.py
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from sparsematrix_tpu.formats import CodebookDense
from sparsematrix_tpu.kernels import codebook_pallas as cbp
from sparsematrix_tpu.utils.testutils import (gen_matrix_random,
                                              gen_sparse_index_matrix,
                                              relative_check)
from sparsematrix_tpu.utils.timer import bench_fn_slope

m, n, k = 117, 1023, 2047
rng = np.random.default_rng(4)
a = jnp.asarray(gen_matrix_random(rng, m, k))
idx_mtx, table = gen_sparse_index_matrix(rng, k, n, density=0.25,
                                         table_size=255)
b_dns = CodebookDense.from_index_matrix(idx_mtx, table, trans=True)
b_dense = np.asarray(b_dns.todense()).T.astype(np.float64)
oracle = np.asarray(a).astype(np.float64) @ b_dense

# XLA dequant race (the measured winner so far)
fd = jax.jit(lambda aa: jnp.dot(
    aa.astype(jnp.bfloat16),
    b_dns.val_table.astype(jnp.bfloat16)[b_dns.idx.astype(jnp.int32)].T
).astype(jnp.float32))
res = bench_fn_slope(fd, a, iters=8, inner_lo=16, inner_hi=144)
print(f"xla-dequant-bf16: {res.min_ms*1e3:.1f} us", flush=True)

for tn, kt, mt in ((256, 1024, 512), (128, 1024, 512), (512, 1024, 512),
                   (256, 2048, 512), (256, 512, 512), (256, 1024, 128),
                   (128, 2048, 128)):
    try:
        cbp._TN, cbp._KT, cbp._MT = tn, kt, mt
        f = jax.jit(lambda aa: cbp.codebook_matmul(aa, b_dns))
        got = np.asarray(f(a))
        ok = relative_check(got, oracle)
        res = bench_fn_slope(f, a, iters=8, inner_lo=16, inner_hi=144)
        print(f"fused tn={tn} kt={kt} mt={mt}: {res.min_ms*1e3:.1f} us "
              f"check={ok}", flush=True)
    except Exception as e:
        print(f"fused tn={tn} kt={kt} mt={mt}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
