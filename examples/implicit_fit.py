"""Differentiating THROUGH a sparse triangular solve — recover the values
of a lower-triangular operator from solution observations.

Given observations ``x_obs = T_true^{-1} b`` for a handful of right-hand
sides, fit the values of ``T`` on its (known) sparsity pattern by gradient
descent on ``||T^{-1} b - x_obs||^2``.  The gradient flows through the
wave-batched MXU solve via the implicit-function rule
(``trisolve_waves_solve``): each backward pass is ONE transposed wave
solve plus two pattern gathers — no unrolling, no inverse chain rule.

The forward solve uses host-inverted diagonal blocks, so the plan must be
refreshed whenever the values move: this example re-plans every outer
step (host work), then runs a jitted inner loss/grad over all RHS — the
pattern of a production implicit-diff pipeline (plan slow-changing
operators rarely, differentiate often).

Run: python examples/implicit_fit.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.trisolve_waves import (
    trisolve_waves_plan,
    trisolve_waves_solve,
)


def main():
    rng = np.random.default_rng(0)
    n, k = 512, 4

    # ground truth: well-conditioned lower-triangular, random pattern
    m = sps.random(n, n, density=0.01, random_state=3, format="coo")
    keep = m.col < m.row
    r = np.concatenate([m.row[keep], np.arange(n)])
    c = np.concatenate([m.col[keep], np.arange(n)])
    v_true = np.concatenate([rng.uniform(-0.3, 0.3, keep.sum()),
                             rng.uniform(2.0, 3.0, n)]).astype(np.float32)
    T_true = CSR.from_scipy(
        sps.csr_matrix((v_true, (r, c)), shape=(n, n)))

    B = rng.standard_normal((n, k)).astype(np.float32)
    plan_true = trisolve_waves_plan(T_true, lower=True)
    from sparsematrix_tpu.kernels.trisolve_waves import \
        trisolve_waves_apply_mm

    X_obs = trisolve_waves_apply_mm(plan_true, jnp.asarray(B))

    # start from a perturbed operator on the same pattern
    sp0 = T_true.to_scipy().tocsr()
    vals = jnp.asarray(sp0.data * (1.0 + 0.25 * rng.standard_normal(
        sp0.nnz).astype(np.float32)))

    def refit_plan(v):
        spv = sps.csr_matrix(
            (np.asarray(v), sp0.indices, sp0.indptr), shape=(n, n))
        return trisolve_waves_plan(CSR.from_scipy(spv), lower=True,
                                   with_grads=True)

    @jax.jit
    def loss_and_grad(plan, v):
        def loss(vv):
            cols = [trisolve_waves_solve(plan, vv, jnp.asarray(B[:, j]))
                    for j in range(k)]
            X = jnp.stack(cols, axis=1)
            return 0.5 * jnp.sum((X - X_obs) ** 2)

        return jax.value_and_grad(loss)(v)

    import optax

    opt = optax.adam(0.03)
    state = opt.init(vals)
    L0 = None
    for step in range(150):
        plan = refit_plan(vals)  # host re-plan: values moved
        L, g = loss_and_grad(plan, vals)
        if L0 is None:
            L0 = float(L)
        upd, state = opt.update(g, state)
        vals = optax.apply_updates(vals, upd)
        if step % 30 == 0 or step == 149:
            print(f"step {step:3d}  loss {float(L):.6f}")

    err = float(np.linalg.norm(np.asarray(vals)[: sp0.nnz] - sp0.data)
                / np.linalg.norm(sp0.data))
    print(f"relative value error vs ground truth: {err:.4f}")
    # k·n observations vs nnz unknowns leaves the problem ill-conditioned;
    # success = the descent direction through the solve is right (loss
    # collapses by >100x), not a perfect recovery
    assert float(L) < L0 / 100, "fit did not converge"
    print("ok: gradient descent through the sparse solve fit T "
          f"(loss {L0:.2f} -> {float(L):.4f})")


if __name__ == "__main__":
    main()
