"""Matrix reordering — bandwidth/level-structure optimization.

Host-side setup utilities (the encode-once stance): a good symmetric
permutation concentrates each 128-row tile's columns into few 1024-column
windows (better row-lane slab fill) and shrinks the dependency-level
count of triangular factors (fewer fused-trisolve segments).

No reference counterpart (the reference never reorders); standard sparse
practice (RCM) expressed over scipy's csgraph, emitting permutations the
pytree containers apply structurally.
"""
from __future__ import annotations

import numpy as np

from ..formats.csr import CSR

__all__ = ["rcm_permutation", "permute_csr", "bandwidth"]


def rcm_permutation(A: CSR, symmetric_mode: bool = True) -> np.ndarray:
    """Reverse Cuthill–McKee ordering of A's graph.

    Returns ``perm`` with the meaning *new row i = old row perm[i]*.
    ``symmetric_mode=True`` treats the pattern as structurally symmetric
    (uses A+A^T implicitly, scipy semantics).
    """
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    sp = A.to_scipy().tocsr()
    return np.asarray(reverse_cuthill_mckee(sp, symmetric_mode=symmetric_mode),
                      dtype=np.int64)


def permute_csr(A: CSR, row_perm: np.ndarray,
                col_perm: np.ndarray | None = None) -> CSR:
    """``B[i, j] = A[row_perm[i], col_perm[j]]`` (col_perm defaults to
    row_perm — the symmetric similarity permutation)."""
    sp = A.to_scipy().tocsr()
    cp = row_perm if col_perm is None else col_perm
    inv_c = np.empty(len(cp), dtype=np.int64)
    inv_c[np.asarray(cp)] = np.arange(len(cp))
    out = sp[np.asarray(row_perm), :][:, np.asarray(cp)]
    # scipy fancy indexing already maps columns; ensure canonical form
    out = out.tocsr()
    out.sort_indices()
    return CSR.from_scipy(out)


def bandwidth(A: CSR) -> int:
    """max |i - j| over stored entries (0 for diagonal/empty)."""
    sp = A.to_scipy().tocoo()
    if sp.nnz == 0:
        return 0
    return int(np.abs(sp.row.astype(np.int64) - sp.col).max())
