"""XL dual-gather with spill_cap=auto (capped body + pooled tail).

Run: timeout 1200 python benchmarks/probe_dualgather_xl3.py
"""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses
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
    want = sp.astype(np.float64) @ x
    spq = sp.copy()
    spq.data = np.asarray(jnp.asarray(sp.data).astype(jnp.bfloat16)).astype(
        np.float64)
    want_bf = spq @ x

    t0 = time.time()
    packed = pack_dualgather(A, spill_cap="auto", k_tiles=16, group=256)
    print(f"pack: {time.time()-t0:.0f}s, body g={packed.group} "
          f"kt={packed.k_tiles} slabs={packed.vals.size // 1024}, "
          f"tail g={packed.tail.group if packed.tail else 0} "
          f"slabs={packed.tail.vals.size // 1024 if packed.tail else 0} "
          f"nnz={packed.tail.nnz if packed.tail else 0}, "
          f"fill={packed.fill_rate:.3f}", flush=True)

    for dtype, tag, vb, wt in ((None, "fp32", 4, want),
                               (jnp.bfloat16, "bf16", 2, want_bf)):
        p = packed
        if dtype is not None:
            p = dataclasses.replace(
                packed, vals=packed.vals.astype(dtype),
                tail=(None if packed.tail is None else dataclasses.replace(
                    packed.tail, vals=packed.tail.vals.astype(dtype))))
        sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n,
                                                         val_bytes=vb))
        f = jax.jit(lambda pp, vv: spmv_dualgather(pp, vv))
        got = np.asarray(f(p, xj))
        rel = np.abs(got - wt) / np.maximum(np.abs(wt), 1e-6)
        res = bench_chain_slope(
            lambda y, p_: f(p_, y) * jnp.float32(2.0 ** -20), xj, p,
            iters=6)
        gnnz = A.nnz / (res.min_ms * 1e-3) / 1e9
        nb = p.vals.dtype.itemsize
        slab_bytes = (p.vals.size * nb + p.idxA.size + p.idxB.size)
        if p.tail is not None:
            slab_bytes += (p.tail.vals.size * nb + p.tail.idxA.size
                           + p.tail.idxB.size + p.tail.ptr.size * 4)
        bw = slab_bytes / (res.min_ms * 1e-3) / 1e9 / active_chip().hbm_gbps
        print(f"{tag}: {res.min_ms:.3f} ms, {gnnz:.1f} Gnnz/s, "
              f"SoL {gnnz / (sol / 1e9) * 100:.1f}%, util {bw*100:.1f}%, "
              f"p99rel {np.quantile(rel, .99):.1e}", flush=True)


if __name__ == "__main__":
    main()
