from .krylov import cg, bicgstab, SolveResult
from .gmres import gmres

__all__ = ["cg", "bicgstab", "gmres", "SolveResult"]
