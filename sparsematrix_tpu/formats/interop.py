"""Interop with ``jax.experimental.sparse`` (BCOO) and torch.sparse.

Lets users of the wider JAX sparse ecosystem move matrices in and out of
this framework's formats without densifying.
"""
from __future__ import annotations

import numpy as np

from .coo import COO
from .csr import CSR

__all__ = ["from_bcoo", "to_bcoo", "from_torch", "to_torch"]


def from_bcoo(mat, capacity: int | None = None) -> COO:
    """jax.experimental.sparse.BCOO (2-D, n_batch=0) → COO."""
    idx = np.asarray(mat.indices)
    data = np.asarray(mat.data)
    if idx.ndim != 2 or idx.shape[1] != 2:
        raise ValueError("expected a 2-D unbatched BCOO")
    order = np.lexsort((idx[:, 1], idx[:, 0]))
    return COO.from_arrays(idx[order, 0], idx[order, 1], data[order],
                           mat.shape, capacity)


def to_bcoo(sp):
    from jax.experimental import sparse as jsparse
    import jax.numpy as jnp

    coo = sp if isinstance(sp, COO) else COO.from_scipy(sp.to_scipy())
    n = coo.nnz
    indices = jnp.stack([coo.row[:n], coo.col[:n]], axis=1)
    return jsparse.BCOO((coo.data[:n], indices), shape=coo.shape)


def from_torch(t, capacity: int | None = None) -> CSR:
    """torch.sparse_csr / sparse_coo tensor → CSR (CPU path)."""
    t = t.cpu()
    if t.layout.__repr__() == "torch.sparse_csr":
        import scipy.sparse as s

        m = s.csr_matrix(
            (
                t.values().numpy(),
                t.col_indices().numpy(),
                t.crow_indices().numpy(),
            ),
            shape=tuple(t.shape),
        )
        return CSR.from_scipy(m, capacity=capacity)
    tc = t.coalesce()
    idx = tc.indices().numpy()
    import scipy.sparse as s

    m = s.coo_matrix((tc.values().numpy(), (idx[0], idx[1])),
                     shape=tuple(t.shape))
    return CSR.from_scipy(m.tocsr(), capacity=capacity)


def to_torch(sp):
    import torch

    m = sp.to_scipy().tocsr()
    return torch.sparse_csr_tensor(
        torch.from_numpy(m.indptr.astype(np.int64)),
        torch.from_numpy(m.indices.astype(np.int64)),
        torch.from_numpy(m.data),
        size=m.shape,
    )
