#!/usr/bin/env python
"""MEASURED (simulated-mesh) weak-scaling curves for dist_spmv/dist_spmm/
dist_cg on 1/2/4/8 virtual CPU devices.

Absolute CPU times are meaningless for TPU projection; what these rows
validate is the SHAPE of the scaling model (parallel/scaling.py): constant
per-device work + collective volume growing with device count should keep
step time ~flat.  Rows are labeled SIMULATED and carry the measured
relative efficiency t(1)/t(n) so BASELINE.md can state the model-vs-sim
deviation (VERDICT r3 weak item 7).

Run (CPU — safe alongside a TPU session):
    python benchmarks/measure_sim_scaling.py
writes benchmarks/pass_sim_scaling.json (mergeable by merge_results.py).
"""
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


def _force_devices(n=8):
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()


_force_devices()

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from sparsematrix_tpu.formats import CSR  # noqa: E402
from sparsematrix_tpu.parallel import (  # noqa: E402
    dist_cg, dist_spmm, dist_spmv, partition_csr_rows,
)

BASE_ROWS = 2048
NNZ_ROW = 64
K = 32
REPS = 30


def _build(rows, rng):
    r = np.repeat(np.arange(rows), NNZ_ROW)
    c = rng.integers(0, rows, rows * NNZ_ROW)
    import scipy.sparse as sps

    v = rng.normal(size=rows * NNZ_ROW).astype(np.float32)
    sp = sps.coo_matrix((v, (r, c)), shape=(rows, rows)).tocsr()
    sp.sum_duplicates()
    return CSR.from_scipy(sp), sp


def _time(f, *args):
    y = jax.block_until_ready(f(*args))  # compile + warm
    best = np.inf
    for _ in range(REPS):
        t0 = time.perf_counter()
        y = jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    del y
    return best


def main():
    rng = np.random.default_rng(11)
    devs = jax.devices()
    assert len(devs) >= 8, devs
    rows_out = []
    t1 = {}
    for nd in (1, 2, 4, 8):
        rows = BASE_ROWS * nd
        A, sp = _build(rows, rng)
        part = partition_csr_rows(A, nd)
        mesh = Mesh(np.array(devs[:nd]), ("shard",))
        x = jnp.asarray(rng.normal(size=rows).astype(np.float32))
        X = jnp.asarray(rng.normal(size=(rows, K)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=rows).astype(np.float32))

        cases = {
            "spmv": (jax.jit(
                lambda p, v, m=mesh: dist_spmv(p, v, m)), part, x),
            "spmm": (jax.jit(
                lambda p, v, m=mesh: dist_spmm(p, v, m)), part, X),
            "cg8": (lambda p, v, m=mesh: dist_cg(
                p, v, m, maxiter=8, tol=0.0).x, part, b),
        }
        for tag, (f, *args) in cases.items():
            t = _time(f, *args)
            t1.setdefault(tag, t)
            eff = t1[tag] / t
            rows_out.append({
                "name": f"weak_scaling/sim-{tag}-{nd}dev",
                "shape": f"rows={rows},nnz/row={NNZ_ROW}"
                         + (f",k={K}" if tag == "spmm" else "")
                         + ",SIMULATED cpu mesh",
                "min_ms": t * 1e3,
                "mean_ms": t * 1e3,
                "gnnz_per_s": A.nnz / t / 1e9,
                "sol_frac": None,
                "checked": None,
                "nnz": A.nnz,
                "extras": {"simulated": True, "n_devices": nd,
                           "weak_scaling_efficiency": eff},
            })
            print(f"{tag} {nd}dev rows={rows}: {t*1e3:.2f} ms "
                  f"(eff {eff*100:.0f}%)", flush=True)
    out = "/root/repo/benchmarks/pass_sim_scaling.json"
    with open(out, "w") as fh:
        json.dump(rows_out, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
