"""XL dual-gather SUPERBLOCK sweep: k_tiles=16, groups 128/256, fp32+bf16.

Run: timeout 1200 python benchmarks/probe_dualgather_xl4.py
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
from sparsematrix_tpu.kernels import spmv_dualgather as dgm
from sparsematrix_tpu.kernels.spmv_dualgather import (DualGather,
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

    spc = sp.tocoo()
    r = spc.row.astype(np.int64)
    c = spc.col.astype(np.int64)
    v = spc.data
    t0 = time.time()
    assigned = dgm._assign_slots(r, c, n, n)
    print(f"assign: {time.time()-t0:.0f}s", flush=True)
    orig = dgm._assign_slots
    dgm._assign_slots = lambda *a, **k: assigned
    try:
        for group, kt, dtype, tag in (
                (256, 64, None, "fp32-sb64-g256"),
                (128, 32, None, "fp32-sb32-g128"),
                (256, 32, None, "fp32-sb32-g256"),
                (512, 64, jnp.bfloat16, "bf16-sb64-g512"),
                (1024, 32, jnp.bfloat16, "bf16-sb32-g1024")):
            arrs = dgm._pack_arrays(r, c, v, n, n, group, v.dtype,
                                    k_tiles=kt)
            vals = jnp.asarray(arrs["vals"])
            if dtype is not None:
                vals = vals.astype(dtype)
            packed = DualGather(
                idxA=jnp.asarray(arrs["idxA"], jnp.int8),
                idxB=jnp.asarray(arrs["idxB"], jnp.int8),
                vals=vals,
                group_tile=jnp.asarray(arrs["group_tile"], jnp.int32),
                slab_win=jnp.asarray(arrs["slab_win"], jnp.int32),
                slab_tloc=jnp.asarray(arrs["slab_tloc"], jnp.int32),
                commit=jnp.asarray(arrs["commit"], jnp.int32),
                tail=None, t_pack=None, shape=(n, n),
                n_tiles=arrs["n_tiles"], n_win=arrs["n_win"],
                group=arrs["group"], k_tiles=kt, nnz=A.nnz,
                splits=tuple(dgm._sb_splits(arrs["group_tile"],
                                            arrs["group"])))
            sol = speed_of_light_nnz_s(
                A.nnz, spmv_csr_bytes(A.nnz, n, n,
                                      val_bytes=2 if dtype else 4))
            wt = want_bf if dtype is not None else want
            f = jax.jit(lambda p, vv: spmv_dualgather(p, vv))
            got = np.asarray(f(packed, xj))
            rel = np.abs(got - wt) / np.maximum(np.abs(wt), 1e-6)
            res = bench_chain_slope(
                lambda y, p_: f(p_, y) * jnp.float32(2.0 ** -20), xj,
                packed, iters=6)
            gnnz = A.nnz / (res.min_ms * 1e-3) / 1e9
            nb = packed.vals.dtype.itemsize
            slab_bytes = (packed.vals.size * nb + packed.idxA.size
                          + packed.idxB.size)
            bw = (slab_bytes / (res.min_ms * 1e-3) / 1e9
                  / active_chip().hbm_gbps)
            print(f"{tag}: fill={packed.fill_rate:.3f} splits="
                  f"{len(packed.splits)} {res.min_ms:.3f} ms, "
                  f"{gnnz:.1f} Gnnz/s, SoL {gnnz/(sol/1e9)*100:.1f}%, "
                  f"util {bw*100:.1f}%, p99rel {np.quantile(rel,.99):.1e}",
                  flush=True)
    finally:
        dgm._assign_slots = orig


if __name__ == "__main__":
    main()
