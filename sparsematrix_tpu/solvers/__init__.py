from .krylov import cg, bicgstab, SolveResult
from .gmres import gmres
from .lanczos import lanczos, eigsh_lanczos, LanczosResult
from .lsqr import lsqr, LsqrResult

__all__ = ["cg", "bicgstab", "gmres", "SolveResult",
           "lsqr", "LsqrResult", "lanczos", "eigsh_lanczos",
           "LanczosResult"]
