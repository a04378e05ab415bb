from .matrix_market import read_mtx, write_mtx
from .serialize import save_npz, load_npz, save_checkpoint, load_checkpoint

__all__ = [
    "read_mtx",
    "write_mtx",
    "save_npz",
    "load_npz",
    "save_checkpoint",
    "load_checkpoint",
]
