"""Matrix Market (.mtx) read/write.

The reference has no file IO at all (CopyForm/CopyTo are memory↔memory,
SURVEY §5) — this fills the standard interchange gap via scipy.io.
"""
from __future__ import annotations

from ..formats import COO, CSR

__all__ = ["read_mtx", "write_mtx"]


def read_mtx(path: str, fmt: str = "csr", capacity: int | None = None):
    import scipy.io as sio

    mat = sio.mmread(path)
    if fmt == "csr":
        return CSR.from_scipy(mat.tocsr(), capacity=capacity)
    if fmt == "coo":
        return COO.from_scipy(mat.tocoo(), capacity=capacity)
    raise ValueError(f"unknown fmt {fmt!r}")


def write_mtx(path: str, sp) -> None:
    import scipy.io as sio

    sio.mmwrite(path, sp.to_scipy())
