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
with tau * sigma * ||A||^2 < 1. Feasible-bounded polytopes give convergence
to an optimal vertex; the duality gap is returned for diagnostics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import rdtype

__all__ = ["solve_lp_batch"]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _pdhg(c_batch, a_matrix, b_batch, tau, sigma, n_iter):
    """Run PDHG; c_batch (..., D), a_matrix (K, D), b_batch (..., K)."""

    def step(carry, _):
        x, xbar, y = carry
        y = jnp.maximum(
            0.0, y + sigma * (jnp.einsum("kd,...d->...k", a_matrix, xbar) - b_batch)
        )
        x_new = x - tau * (c_batch + jnp.einsum("kd,...k->...d", a_matrix, y))
        xbar = 2 * x_new - x
        return (x_new, xbar, y), None

    x0 = jnp.zeros_like(c_batch)
    y0 = jnp.zeros_like(b_batch)
    (x, _, y), _ = jax.lax.scan(step, (x0, x0, y0), None, length=n_iter)
    obj = jnp.sum(c_batch * x, axis=-1)
    # dual objective of min c^T x s.t. Ax<=b is -b^T y with A^T y + c = 0;
    # report primal objective and constraint violation for diagnostics
    viol = jnp.max(
        jnp.maximum(
            jnp.einsum("kd,...d->...k", a_matrix, x) - b_batch, 0.0
        ),
        axis=-1,
    )
    return x, obj, viol


def solve_lp_batch(c, a_matrix, b_batch, n_iter: int = 20000):
    """Solve min <c, x> s.t. A x <= b for a batch of right-hand sides.

    Parameters
    ----------
    c : (D,) or (..., D) objective(s)
    a_matrix : (K, D) constraint matrix (shared)
    b_batch : (..., K) right-hand sides

    Returns
    -------
    x : (..., D) solutions
    obj : (...,) objective values
    viol : (...,) max residual constraint violation (diagnostic)
    """
    a = jnp.asarray(a_matrix, dtype=rdtype())
    b = jnp.asarray(b_batch, dtype=rdtype())
    c = jnp.asarray(c, dtype=rdtype())
    if c.ndim == 1:
        c = jnp.broadcast_to(c, b.shape[:-1] + c.shape)
    norm = float(np.linalg.norm(np.asarray(a, dtype=np.float64), ord=2))
    tau = jnp.asarray(0.9 / norm, dtype=rdtype())
    sigma = jnp.asarray(0.9 / norm, dtype=rdtype())
    return _pdhg(c, a, b, tau, sigma, n_iter)
