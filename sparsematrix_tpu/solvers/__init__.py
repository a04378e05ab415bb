from .krylov import cg, bicgstab, SolveResult

__all__ = ["cg", "bicgstab", "SolveResult"]
