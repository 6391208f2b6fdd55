"""Jittable convex optimization replacing the reference's cvxopt solves."""

from .ball import linear_bounds_on_ball_slice
from .lp import solve_lp_batch, solve_lp_batch_factors, solve_lp_batch_kron

__all__ = [
    "linear_bounds_on_ball_slice",
    "solve_lp_batch",
    "solve_lp_batch_factors",
    "solve_lp_batch_kron",
]
