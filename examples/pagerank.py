"""PageRank by power iteration over a sparse link matrix — SpMV workload.

Run: python examples/pagerank.py
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops import spmv_t


def main():
    rng = np.random.default_rng(0)
    n = 2000
    # random graph, ~20 out-links per node
    dense = (rng.random((n, n)) < 20 / n).astype(np.float32)
    np.fill_diagonal(dense, 0)
    out_deg = np.maximum(dense.sum(axis=1, keepdims=True), 1)
    P = CSR.fromdense(dense / out_deg)  # row-stochastic link matrix
    damping = 0.85

    @jax.jit
    def step(r):
        # r' = d * P^T r + (1-d)/n
        return damping * spmv_t(P, r) + (1 - damping) / n

    r = jnp.full((n,), 1.0 / n)
    for _ in range(100):
        r = step(r)
    r.block_until_ready()
    top = np.argsort(-np.asarray(r))[:5]
    print("top-5 pages:", top.tolist(), "sum(r) =", float(r.sum()))


if __name__ == "__main__":
    main()
