"""Batched linear programming on device via PDHG (Chambolle-Pock).

The reference solves its confidence-polytope LPs with cvxopt, two per
confidence level in a Python loop (reference
quantpy/tomography/interval.py:317-329, 394-411):

    min <c, x>  s.t.  A x <= b

Here hundreds of such LPs (one per polytope margin delta, for +/-c) run as
ONE jitted primal-dual iteration, batched over the b vectors. The problems
are tiny (D <= a few hundred variables), so even tens of thousands of PDHG
iterations are cheap on the VPU/MXU.

PDHG for  min_x c^T x + I_{<=b}(Ax):
    y_{k+1} = max(0, y_k + sigma (A xbar_k - b))
    x_{k+1} = x_k - tau (c + A^T y_{k+1})
    xbar_{k+1} = 2 x_{k+1} - x_k
with tau * sigma * ||A||^2 < 1.

Convergence control (round 2; round 1 ran a fixed iteration count): the
iteration runs in chunks under a lax.while_loop and stops when the worst
LP of the batch satisfies the standard PDHG optimality residuals —
primal feasibility ||(Ax - b)_+||_inf, dual feasibility ||c + A^T y||_inf
(with y >= 0 by construction), and the complementarity gap
|c^T x + b^T y| (strong duality: at the optimum c^T x = -b^T y) — all
below tol * (1 + problem scale). The number of iterations actually used is
returned for diagnostics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import rdtype

__all__ = ["solve_lp_batch"]

#: iterations per convergence check
_CHUNK = 500


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _pdhg(c_batch, a_matrix, b_batch, tau, sigma, n_iter, tol):
    """Chunked PDHG with residual-based early stopping.

    c_batch (..., D), a_matrix (K, D), b_batch (..., K). Returns
    (x, obj, viol, iters)."""

    def pdhg_chunk(carry_xy, _):
        x, xbar, y = carry_xy
        y = jnp.maximum(
            0.0, y + sigma * (jnp.einsum("kd,...d->...k", a_matrix, xbar) - b_batch)
        )
        x_new = x - tau * (c_batch + jnp.einsum("kd,...k->...d", a_matrix, y))
        xbar = 2 * x_new - x
        return (x_new, xbar, y), None

    def converged(x, y):
        ax = jnp.einsum("kd,...d->...k", a_matrix, x)
        res_p = jnp.max(jnp.maximum(ax - b_batch, 0.0))
        res_d = jnp.max(
            jnp.abs(c_batch + jnp.einsum("kd,...k->...d", a_matrix, y))
        )
        p_obj = jnp.sum(c_batch * x, axis=-1)
        d_obj = -jnp.sum(b_batch * y, axis=-1)
        gap = jnp.max(jnp.abs(p_obj - d_obj))
        scale = 1.0 + jnp.max(jnp.abs(p_obj)) + jnp.max(jnp.abs(d_obj))
        return (
            (res_p <= tol * (1.0 + jnp.max(jnp.abs(b_batch))))
            & (res_d <= tol * (1.0 + jnp.max(jnp.abs(c_batch))))
            & (gap <= tol * scale)
        )

    def cond(carry):
        _, _, _, it, done = carry
        return jnp.logical_and(it < n_iter, jnp.logical_not(done))

    def step(carry):
        x, xbar, y, it, _ = carry
        (x, xbar, y), _ = jax.lax.scan(
            pdhg_chunk, (x, xbar, y), None, length=_CHUNK
        )
        return x, xbar, y, it + _CHUNK, converged(x, y)

    x0 = jnp.zeros_like(c_batch)
    y0 = jnp.zeros_like(b_batch)
    x, _, y, iters, _ = jax.lax.while_loop(
        cond, step, (x0, x0, y0, jnp.asarray(0), jnp.asarray(False))
    )
    obj = jnp.sum(c_batch * x, axis=-1)
    viol = jnp.max(
        jnp.maximum(
            jnp.einsum("kd,...d->...k", a_matrix, x) - b_batch, 0.0
        ),
        axis=-1,
    )
    return x, obj, viol, iters


def solve_lp_batch(c, a_matrix, b_batch, n_iter: int = 20000, tol: float | None = None):
    """Solve min <c, x> s.t. A x <= b for a batch of right-hand sides.

    Parameters
    ----------
    c : (D,) or (..., D) objective(s)
    a_matrix : (K, D) constraint matrix (shared)
    b_batch : (..., K) right-hand sides
    n_iter : iteration cap (checked every 500 iterations)
    tol : residual/duality-gap tolerance for early stopping; default
        1e-9 in x64, 3e-5 in f32 (the PDHG drift floor on TPU)

    Returns
    -------
    x : (..., D) solutions
    obj : (...,) objective values
    viol : (...,) max residual constraint violation (diagnostic)
    iters : () number of iterations actually run (diagnostic)
    """
    a = jnp.asarray(a_matrix, dtype=rdtype())
    b = jnp.asarray(b_batch, dtype=rdtype())
    c = jnp.asarray(c, dtype=rdtype())
    if c.ndim == 1:
        c = jnp.broadcast_to(c, b.shape[:-1] + c.shape)
    if tol is None:
        tol = 1e-9 if np.dtype(rdtype()) == np.float64 else 3e-5
    norm = float(np.linalg.norm(np.asarray(a, dtype=np.float64), ord=2))
    tau = jnp.asarray(0.9 / norm, dtype=rdtype())
    sigma = jnp.asarray(0.9 / norm, dtype=rdtype())
    return _pdhg(c, a, b, tau, sigma, n_iter, jnp.asarray(tol, dtype=rdtype()))
