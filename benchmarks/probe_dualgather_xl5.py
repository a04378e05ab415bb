"""XL two-window dual-gather probe (round 4, VERDICT item 1).

One config per invocation (keeps each TPU run under the 570 s budget);
the slot assignment is cached on disk per (two_win) so later configs skip
the ~100 s packer.  Usage:

    timeout 570 python benchmarks/probe_dualgather_xl5.py CFG

CFG ∈ base-fp32-g256 | tw-fp32-g256 | tw-fp32-g128 | tw-bf16-g512
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
from sparsematrix_tpu.kernels import spmv_dualgather as dgm
from sparsematrix_tpu.kernels.spmv_dualgather import (pack_dualgather,
                                                      spmv_dualgather)
from sparsematrix_tpu.utils.roofline import (active_chip,
                                             speed_of_light_nnz_s,
                                             spmv_csr_bytes)
from sparsematrix_tpu.utils.timer import bench_chain_slope

CFGS = {
    "base-fp32-g256": dict(group=256, k_tiles=32, dtype=None, two_win=False),
    "tw-fp32-g256": dict(group=256, k_tiles=32, dtype=None, two_win=True),
    "tw-fp32-g128": dict(group=128, k_tiles=32, dtype=None, two_win=True),
    "tw-bf16-g512": dict(group=512, k_tiles=32, dtype=jnp.bfloat16,
                         two_win=True),
    "tw-fp32-kt8-g128": dict(group=128, k_tiles=8, dtype=None,
                             two_win=True),
    "base-fp32-kt8-g128": dict(group=128, k_tiles=8, dtype=None,
                               two_win=False),
    "tw-bf16-kt8-g256": dict(group=256, k_tiles=8, dtype=jnp.bfloat16,
                             two_win=True),
    "tw-fp32-kt8-g32": dict(group=32, k_tiles=8, dtype=None,
                            two_win=True),
    "tw-fp32-kt16-g128": dict(group=128, k_tiles=16, dtype=None,
                              two_win=True),
}

ASSIGN_CACHE = "/root/repo/benchmarks/.xl5_assign_{}.npz"


def build():
    n, nnz_row = 32768, 512
    g = np.random.default_rng(9)
    rows_ = np.repeat(np.arange(n), nnz_row)
    cols_ = g.integers(0, n, n * nnz_row)
    data_ = g.uniform(-1000, 1000, n * nnz_row).astype(np.float32)
    sp = sps.coo_matrix((data_, (rows_, cols_)), shape=(n, n)).tocsr()
    sp.sum_duplicates()
    return CSR.from_scipy(sp), sp, n


def main():
    import os
    dgm._ACC_MODE = os.environ.get("ACC_MODE", "masked")
    print("acc_mode:", dgm._ACC_MODE, flush=True)
    cfg_name = sys.argv[1]
    cfg = CFGS[cfg_name]
    A, sp, n = build()
    x = np.random.default_rng(9).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    want = sp.astype(np.float64) @ x
    if cfg["dtype"] is not None:
        spq = sp.copy()
        spq.data = np.asarray(
            jnp.asarray(sp.data).astype(jnp.bfloat16)).astype(np.float64)
        want = spq @ x

    # disk-cache the slot assignment (deterministic in (r, c))
    two_win = cfg["two_win"]
    path = ASSIGN_CACHE.format("tw" if two_win else "base")
    orig = dgm._assign_slots
    try:
        z = np.load(path)
        assigned = tuple(z[k] for k in ("t", "w", "s", "u", "l", "cl", "ch"))
        dgm._assign_slots = lambda *a, **k: assigned
        print("assign: cached", flush=True)
    except FileNotFoundError:
        t0 = time.time()

        def capture(*a, **k):
            res = orig(*a, **k)
            np.savez(path, **dict(zip(("t", "w", "s", "u", "l", "cl", "ch"),
                                      res)))
            return res

        dgm._assign_slots = capture
        print(f"assign: computing (~100 s)", flush=True)
    try:
        t0 = time.time()
        packed = pack_dualgather(A, group=cfg["group"],
                                 k_tiles=cfg["k_tiles"],
                                 dtype=cfg["dtype"], two_win=two_win)
        print(f"pack: {time.time()-t0:.0f}s fill={packed.fill_rate:.3f} "
              f"nibble={packed.nibble} splits={len(packed.splits)}",
              flush=True)
    finally:
        dgm._assign_slots = orig

    vb = 2 if cfg["dtype"] is not None else 4
    sol = speed_of_light_nnz_s(A.nnz, spmv_csr_bytes(A.nnz, n, n,
                                                     val_bytes=vb))
    f = jax.jit(lambda p, v: spmv_dualgather(p, v))
    got = np.asarray(f(packed, xj))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
    res = bench_chain_slope(
        lambda y, p_: f(p_, y) * jnp.float32(2.0 ** -20), xj, packed,
        iters=6)
    gnnz = A.nnz / (res.min_ms * 1e-3) / 1e9
    nb = packed.vals.dtype.itemsize
    slab_bytes = (packed.vals.size * nb + packed.idxA.size
                  + packed.idxB.size)
    bw = slab_bytes / (res.min_ms * 1e-3) / 1e9 / active_chip().hbm_gbps
    print(f"{cfg_name}: fill={packed.fill_rate:.3f} {res.min_ms:.3f} ms, "
          f"{gnnz:.1f} Gnnz/s, SoL {gnnz/(sol/1e9)*100:.1f}%, "
          f"bw {bw*100:.1f}%, p99rel {np.quantile(rel, .99):.1e} "
          f"maxrel {rel.max():.1e}", flush=True)


if __name__ == "__main__":
    main()
