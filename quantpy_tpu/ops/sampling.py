"""On-device measurement-outcome sampling.

The reference draws POVM outcomes with the *global, unseeded* NumPy RNG, one
Python call per POVM (quantpy/tomography/state.py:111-114). Here sampling is a
pure function of an explicit `jax.random` key, fully batched: a whole
bootstrap's worth of experiments is drawn in one jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import rdtype

__all__ = ["sample_multinomial", "simulate_outcome_counts"]


def sample_multinomial(key, n_trials, probs, shape=None):
    """Multinomial counts with outcomes along the last axis of `probs`.

    Parameters
    ----------
    key : jax PRNG key
    n_trials : scalar or array broadcastable to probs.shape[:-1]
        Number of shots per distribution.
    probs : (..., n_outcomes) array
        Outcome probabilities (need not be exactly normalized; they are
        renormalized defensively, matching the reference's clip-to-[0,1]
        at quantpy/tomography/state.py:110).
    shape : optional result batch shape (prefix, excluding outcome axis).
    """
    probs = jnp.asarray(probs, dtype=rdtype())
    probs = jnp.clip(probs, 0.0, 1.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    n_trials = jnp.asarray(n_trials, dtype=rdtype())
    return jax.random.multinomial(key, n_trials, probs, shape=shape)


def simulate_outcome_counts(key, povm_matrix, bloch, n_measurements):
    """Simulate a tomography experiment: counts[m, o] ~ Multinomial.

    probabilities p[m, o] = (povm_matrix[m, o] . bloch) * 2^n
    (reference quantpy/tomography/state.py:109-114).

    Parameters
    ----------
    key : jax PRNG key
    povm_matrix : (n_povms, n_outcomes, 4^n) real array of bloch rows
    bloch : (..., 4^n) state bloch vector(s); leading batch dims allowed
    n_measurements : scalar or (n_povms,) shots per POVM

    Returns
    -------
    counts : (..., n_povms, n_outcomes)
    """
    povm_matrix = jnp.asarray(povm_matrix, dtype=rdtype())
    bloch = jnp.asarray(bloch, dtype=rdtype())
    dim2 = povm_matrix.shape[-1]  # 4^n
    probs = jnp.einsum("mod,...d->...mo", povm_matrix, bloch) * jnp.sqrt(
        jnp.asarray(dim2, dtype=rdtype())
    )
    batch_shape = probs.shape[:-1]
    n_measurements = jnp.broadcast_to(
        jnp.asarray(n_measurements, dtype=rdtype()), batch_shape
    )
    return sample_multinomial(key, n_measurements, probs)
