from .linalg import inv3x3, solve_psd

__all__ = ["inv3x3", "solve_psd"]
