"""Training through the sparse kernels — gradient descent on the stored
values of a fixed sparsity pattern (static-sparsity training), exercising
the custom VJPs on the Pallas fast paths.

The reference is inference-only; autodiff through every kernel is a
capability a JAX-native framework owes its users.

Run: python examples/sparse_training.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_rowlane import (
    pack_sell_rowlane,
    spmv_sell_rowlane,
)


def main():
    rng = np.random.default_rng(0)
    n, m = 512, 2048
    # fixed random sparsity pattern, learnable values
    dense = (rng.random((n, m)) < 0.05).astype(np.float32)
    dense *= rng.standard_normal((n, m)).astype(np.float32)
    packed = pack_sell_rowlane(CSR.fromdense(dense), with_transpose=True)

    # regression target from a hidden dense teacher
    W_true = rng.standard_normal((n, m)).astype(np.float32) * 0.1
    x = rng.standard_normal(m).astype(np.float32)
    y = W_true @ x

    @jax.jit
    def loss_fn(p, x, y):
        pred = spmv_sell_rowlane(p, x)
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(p, x, y, lr):
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(p, x, y)
        # only the value plane trains; the layout is static
        import dataclasses

        return loss, dataclasses.replace(p, vals=p.vals - lr * grads.vals)

    p = packed
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    for i in range(30):
        loss, p = step(p, xj, yj, 1e-3)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.4f}")
    start = float(loss_fn(packed, xj, yj))
    print(f"final loss {float(loss):.4f} (started ~{start:.4f})")
    assert float(loss) < start
    print("OK: gradients flow through the Pallas SpMV fast path")


if __name__ == "__main__":
    main()
