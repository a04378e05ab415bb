"""Chained-timing group/dtype sweep for the XL rowlane SpMV.

TODO_ROUND3 truth: chained fp32 g128 runs 0.55 ms = 629 GB/s = 77 % of
spec HBM bandwidth — the kernel is DMA-bound.  Levers probed here, all
under the trustworthy value-chain timing (bench_chain_slope):

  * group size (64 / 128 / 256): fewer grid steps amortize step cost,
    larger slabs-per-step may improve DMA efficiency toward 90 %.
  * bf16 values (×5/3 less traffic at equal fill).
  * lanes_per_row=2 (collision depth ÷2 — fill may rise at equal slabs).

Emits one JSON line per row + benchmarks/probe_xl_chain.json.
"""
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
from sparsematrix_tpu.kernels.spmv_rowlane import pack_sell_rowlane, spmv_sell_rowlane
from sparsematrix_tpu.utils.roofline import active_chip, speed_of_light_nnz_s, spmv_csr_bytes
from sparsematrix_tpu.utils.timer import bench_chain_slope

OUT = []


def emit(row):
    OUT.append(row)
    print(json.dumps(row), flush=True)
    with open("/root/repo/benchmarks/probe_xl_chain.json", "w") as f:
        json.dump(OUT, f, indent=1)


def build(n=32768, nnz_row=512):
    g = np.random.default_rng(9)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g.integers(0, n, n * nnz_row)
    data_ = g.uniform(-1000, 1000, n * nnz_row).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    return CSR.from_scipy(sp), sp


def main():
    n = 32768
    A, sp = build(n)
    x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    want = sp.astype(np.float64) @ x
    spq = sp.copy()
    spq.data = np.asarray(jnp.asarray(sp.data).astype(jnp.bfloat16)).astype(np.float64)
    want_bf16 = spq @ x
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n))
    f = jax.jit(lambda p, v: spmv_sell_rowlane(p, v))
    chain_scale = jnp.float32(2.0 ** -20)
    variants = [
        ("fp32-g64", dict(group=64)),
        ("fp32-g128", dict(group=128)),
        ("fp32-g256", dict(group=256)),
        ("bf16-g128", dict(group=128, dtype=jnp.bfloat16)),
        ("bf16-g256", dict(group=256, dtype=jnp.bfloat16)),
        ("bf16-g128-L2", dict(group=128, dtype=jnp.bfloat16, lanes_per_row=2)),
    ]
    for tag, kws in variants:
        t0 = time.time()
        packed = pack_sell_rowlane(A, **kws)
        pack_s = time.time() - t0
        res = bench_chain_slope(
            lambda y, p_: f(p_, y) * chain_scale, xj, packed, iters=6)
        got = np.asarray(f(packed, xj))
        ref = want_bf16 if kws.get("dtype") is not None else want
        err = float(np.max(np.abs(got - ref) / (np.abs(ref) + 1.0)))
        slab_bytes = (packed.vals.size * packed.vals.dtype.itemsize
                      + packed.s_idx.size)
        gnnz = A.nnz / (res.min_ms * 1e-3) / 1e9
        emit({
            "name": f"probe_xl_chain/{tag}",
            "min_ms": round(res.min_ms, 4),
            "gnnz_s": round(gnnz, 2),
            "sol": round(gnnz * 1e9 / sol, 4),
            "bw_util": round(slab_bytes / (res.min_ms * 1e-3) / 1e9
                             / active_chip().hbm_gbps, 4),
            "fill": round(packed.fill_rate, 4),
            "group": packed.group,
            "slabs": int(packed.vals.shape[0] * packed.group),
            "pack_s": round(pack_s, 2),
            "max_rel_err": err,
            "compile_ms": round(res.compile_ms, 1),
        })


if __name__ == "__main__":
    main()
