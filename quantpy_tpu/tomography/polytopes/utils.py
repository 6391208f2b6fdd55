"""Confidence-polytope margin <-> confidence-level conversion (arXiv:2109.04734).

Counterpart of reference quantpy/tomography/polytopes/utils.py:4-27, jitted
and batched: coverage verification needs `count_delta` for every (trial,
confidence-level) pair, which here is one fixed-depth bisection under vmap
instead of a Python while loop per pair.

`frequencies` may be (m, p) for states or (S, m, p) for processes;
`n_measurements` is (m,) and broadcasts over the leading axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...config import rdtype

__all__ = ["count_confidence", "count_delta"]

_EPS = 1e-15


def count_confidence(delta, frequencies, n_measurements):
    """Confidence that the true probabilities lie within +delta of the
    observed frequencies, via the KL/Hoeffding bound
    (reference polytopes/utils.py:4-13). `delta` may be batched (...,)."""
    f = jnp.asarray(frequencies, dtype=rdtype())
    n = jnp.asarray(n_measurements, dtype=rdtype())[:, None]
    delta = jnp.asarray(delta, dtype=rdtype())
    batch = delta.shape
    d = delta.reshape(batch + (1,) * f.ndim)
    fpd = jnp.clip(f + d, _EPS, 1 - _EPS)
    kl = f * jnp.log(f / fpd) + (1 - f) * jnp.log((1 - f) / (1 - fpd))
    kl = jnp.where(f + d < 1 - _EPS, kl, jnp.inf)
    eps = jnp.exp(-n * kl)
    eps = jnp.where(jnp.abs(f - 1) < 2 * _EPS, 0.0, eps)
    per_povm = jnp.maximum(1 - jnp.sum(eps, axis=-1), 0.0)
    axes = tuple(range(len(batch), len(batch) + f.ndim - 1))
    return jnp.prod(per_povm, axis=axes)


@functools.partial(jax.jit, static_argnames=())
def count_delta(target_cl, frequencies, n_measurements):
    """Smallest margin delta achieving `target_cl` confidence: bisection on
    (1e-10, 1) to 1e-10 tolerance (reference polytopes/utils.py:16-27),
    fixed-depth (34 halvings) so it jits and vmaps. `target_cl` may be
    batched."""
    target = jnp.asarray(target_cl, dtype=rdtype())
    lo = jnp.full(target.shape, 1e-10, dtype=rdtype())
    hi = jnp.ones(target.shape, dtype=rdtype())

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2
        conf = count_confidence(mid, frequencies, n_measurements)
        conf = conf.reshape(target.shape)
        go_right = conf < target + 1e-10
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 34, body, (lo, hi))
    return (lo + hi) / 2
