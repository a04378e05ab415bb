from .krylov import cg, bicgstab, SolveResult
from .block import block_cg, BlockSolveResult
from .gmres import gmres
from .lanczos import lanczos, eigsh_lanczos, LanczosResult
from .lsqr import lsqr, LsqrResult

__all__ = ["cg", "bicgstab", "gmres", "SolveResult",
           "block_cg", "BlockSolveResult",
           "lsqr", "LsqrResult", "lanczos", "eigsh_lanczos",
           "LanczosResult"]
