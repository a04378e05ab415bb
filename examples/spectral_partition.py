"""Spectral graph partitioning via the Fiedler vector — Lanczos workload.

Builds a planted two-community graph, forms its sparse Laplacian, runs
``eigsh_lanczos`` on a spectral shift (so the Fiedler pair becomes the
extremal one Lanczos converges to first), and recovers the communities
from the sign of the second eigenvector.

Run: python examples/spectral_partition.py
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.ops import spmv
from sparsematrix_tpu.solvers import eigsh_lanczos


def main():
    rng = np.random.default_rng(0)
    n_half = 400
    n = 2 * n_half
    p_in, p_out = 0.05, 0.002  # planted partition densities
    blocks = np.block([
        [rng.random((n_half, n_half)) < p_in,
         rng.random((n_half, n_half)) < p_out],
        [rng.random((n_half, n_half)) < p_out,
         rng.random((n_half, n_half)) < p_in],
    ])
    A = np.triu(blocks, 1).astype(np.float32)
    A = A + A.T  # symmetric adjacency
    deg = A.sum(axis=1)
    L = np.diag(deg) - A  # graph Laplacian (SPD up to the constant vector)
    Lcsr = CSR.fromdense(jnp.asarray(L))

    # Lanczos converges to EXTREMAL eigenpairs; the Fiedler pair sits at
    # the bottom, so run it on sigma*I - L (top pair there = bottom of L)
    sigma = float(deg.max()) * 2.0
    shifted = lambda v: sigma * v - spmv(Lcsr, v)
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    theta, Y = eigsh_lanczos(shifted, v0, k=48)
    # largest two of (sigma - lambda) = smallest two of L: [-1] is the
    # constant vector (lambda=0), [-2] is the Fiedler vector
    fiedler = np.asarray(Y[-2])
    labels = fiedler > 0

    truth = np.arange(n) < n_half
    acc = max((labels == truth).mean(), (labels != truth).mean())
    lam2 = sigma - float(theta[-2])
    print(f"fiedler value λ₂ ≈ {lam2:.4f}, "
          f"community recovery accuracy = {acc:.3f}")
    assert acc > 0.95, "spectral partition failed to recover the planted cut"


if __name__ == "__main__":
    main()
