"""XL-shape dual-gather SpMV timing on real TPU, vs the rowlane pack.

Chained timing (y <- A.y rescaled) at n=32768, 512 nnz/row, 16.6M nnz —
the csr_spmv_xl scale point.  Prints per-variant Gnnz/s, SoL%, HBM util.

Run: timeout 570 python benchmarks/probe_dualgather_xl.py [fp32|bf16] [group]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.utils.timer import bench_chain_slope
from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_dualgather import (pack_dualgather,
                                                      spmv_dualgather)
from sparsematrix_tpu.utils.roofline import (speed_of_light_nnz_s,
                                             spmv_csr_bytes, active_chip)


def main():
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else None
    group = None
    for a in sys.argv[1:]:
        if a.isdigit():
            group = int(a)
    n, nnz_row = 32768, 512
    g = np.random.default_rng(9)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g.integers(0, n, n * nnz_row)
    data_ = g.uniform(-1000, 1000, n * nnz_row).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    A = CSR.from_scipy(sp)
    x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))

    t0 = time.time()
    packed = pack_dualgather(A, group=group, dtype=dtype)
    pack_s = time.time() - t0
    print(f"pack: {pack_s:.1f}s, group={packed.group}, "
          f"fill={packed.fill_rate:.3f}, "
          f"slabs={packed.vals.size // 1024}", flush=True)

    f = jax.jit(lambda p, v: spmv_dualgather(p, v))
    got = np.asarray(f(packed, xj))
    want = sp.astype(np.float64) @ x
    if dtype is not None:
        spq = sp.copy()
        spq.data = np.asarray(jnp.asarray(sp.data).astype(dtype)).astype(
            np.float64)
        want = spq @ x
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
    print(f"check: median rel {np.median(rel):.2e} "
          f"p99 {np.quantile(rel, 0.99):.2e}", flush=True)

    chain_scale = jnp.float32(2.0 ** -20)
    res = bench_chain_slope(lambda y, p_: f(p_, y) * chain_scale, xj,
                            packed, iters=6)
    gnnz = A.nnz / (res.min_ms * 1e-3) / 1e9
    slab_bytes = (packed.vals.size * packed.vals.dtype.itemsize
                  + packed.idxA.size + packed.idxB.size)
    bw = slab_bytes / (res.min_ms * 1e-3) / 1e9 / active_chip().hbm_gbps
    tag = "bf16" if dtype is not None else "fp32"
    print(f"dualgather-{tag} g={packed.group}: {res.min_ms:.3f} ms, "
          f"{gnnz:.1f} Gnnz/s, SoL {gnnz / (sol / 1e9) * 100:.1f}%, "
          f"HBM util {bw * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
