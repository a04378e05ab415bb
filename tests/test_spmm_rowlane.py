"""Row-lane SpMM kernel vs oracle (interpret on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparsematrix_tpu.formats import CSR
from sparsematrix_tpu.kernels.spmv_rowlane import pack_sell_rowlane
from sparsematrix_tpu.kernels.spmm_rowlane import spmm_rowlane
from sparsematrix_tpu.utils.testutils import gen_random_dense_sparse


@pytest.mark.parametrize("shape,density,k", [
    ((96, 1024), 0.05, 8),
    ((200, 2048), 0.02, 16),
    ((130, 1500), 0.03, 4),   # odd rows/cols
])
def test_spmm_rowlane_matches_oracle(rng, shape, density, k):
    dense = gen_random_dense_sparse(rng, *shape, density=density)
    packed = pack_sell_rowlane(CSR.fromdense(dense), group=4)
    X = rng.standard_normal((shape[1], k)).astype(np.float32)
    got = np.asarray(spmm_rowlane(packed, jnp.asarray(X)))
    want = dense.astype(np.float64) @ X
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=0.5)


def test_spmm_rowlane_rejects_multilane_pack(rng):
    dense = gen_random_dense_sparse(rng, 64, 512, density=0.1)
    p = pack_sell_rowlane(CSR.fromdense(dense), lanes_per_row=2)
    with pytest.raises(ValueError):
        spmm_rowlane(p, jnp.zeros((512, 4), jnp.float32))


def test_spmm_auto_dispatches_rowlane(rng, monkeypatch):
    from sparsematrix_tpu.config import config as cfg
    from sparsematrix_tpu.ops import spmm

    monkeypatch.setattr(cfg, "kernel_impl", "pallas")
    dense = gen_random_dense_sparse(rng, 256, 2048, density=0.02)  # <5%
    A = CSR.fromdense(dense)
    X = jnp.asarray(rng.standard_normal((2048, 16)).astype(np.float32))
    got = np.asarray(spmm(A, X))
    np.testing.assert_allclose(got, dense.astype(np.float64) @ np.asarray(X),
                               rtol=2e-3, atol=0.5)
