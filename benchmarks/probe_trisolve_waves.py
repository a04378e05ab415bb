"""TPU probe: wave trisolve (chain + binv) at the bench point n=4096.

Run: timeout 570 python benchmarks/probe_trisolve_waves.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.trisolve_fused import (trisolve_fused_apply,
                                                     trisolve_fused_plan)
from sparsematrix_tpu.kernels.trisolve_waves import (trisolve_waves_apply,
                                                     trisolve_waves_plan)
from sparsematrix_tpu.ops.ilu import ilu0
from sparsematrix_tpu.utils.timer import bench_fn_slope


def main():
    side = 64
    n = side * side
    Iq = sps.eye(side)
    T = sps.diags([-1, 4, -1], [-1, 0, 1], (side, side))
    A = (sps.kron(Iq, T) + sps.kron(
        sps.diags([-1, -1], [-1, 1], (side, side)), Iq)).tocsr()
    L, U = ilu0(CSR.from_scipy(A.astype(np.float32)))
    nnz = L.nnz
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    import scipy.sparse.linalg as spl

    Ld = L.to_scipy().astype(np.float64).tolil()
    Ld.setdiag(1.0)
    want = spl.spsolve_triangular(Ld.tocsr(), np.asarray(b), lower=True)

    for tag, mk in (
        ("waves-chain", lambda: trisolve_waves_plan(
            L, lower=True, unit_diagonal=True)),
        ("waves-binv4", lambda: trisolve_waves_plan(
            L, lower=True, unit_diagonal=True, mode="binv", m=4)),
        ("fused", lambda: trisolve_fused_plan(
            L, lower=True, unit_diagonal=True)),
    ):
        t0 = time.time()
        plan = mk()
        pack_s = time.time() - t0
        apply_ = (trisolve_waves_apply if tag.startswith("waves")
                  else trisolve_fused_apply)
        f = jax.jit(lambda p, v: apply_(p, v))
        got = np.asarray(f(plan, b))
        err = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
        res = bench_fn_slope(f, plan, b, iters=6, perturb_max_bytes=0)
        gnnz = nnz / (res.min_ms * 1e-3) / 1e9
        mode = getattr(plan, "mode", "-")
        print(f"{tag} (mode={mode}): pack {pack_s:.2f}s "
              f"{res.min_ms * 1e3:.1f} us, {gnnz:.2f} Gnnz/s, "
              f"p99rel {np.quantile(err, .99):.1e}", flush=True)


if __name__ == "__main__":
    main()
