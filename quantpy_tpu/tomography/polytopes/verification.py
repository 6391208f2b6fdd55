"""Monte-Carlo coverage verification of confidence polytopes.

Counterpart of reference quantpy/tomography/polytopes/verification.py:9-78,
the reference's de-facto statistical test harness (SURVEY.md section 4):
repeat the experiment many times and count how often the TRUE state/process
satisfies every polytope inequality at each nominal confidence level.

The reference loops trials in Python (1000+ experiments x bisections each);
here all trials are simulated in one device call and the (trial, level)
bisection grid is one vmapped fixed-depth bisection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...config import rdtype
from ...measurements import generate_measurement_matrix
from .. import state_core
from .utils import count_delta

__all__ = ["test_qst", "test_qpt"]

_EPS = 1e-15


def _coverage(polytope_prod, base_offset, freq_clipped, counts_n_meas, conf_levels,
              clip_b: bool):
    """Shared coverage count: for each (trial, level), check
    min(b - A @ true_bloch) > -EPS with b = clip(freq + delta) - offset."""
    conf_levels = jnp.asarray(conf_levels, dtype=rdtype())

    def per_trial(freq_t):
        # sequential over confidence levels (lax.map) so peak memory stays
        # at one (S, m, p) KL tensor per trial instead of L of them — this
        # is what lets 3-qubit QPT coverage (L x 64 x 27 x 8 per trial)
        # run at 10^4 trials
        def one_level(cl):
            delta = count_delta(cl.reshape(1), freq_t, counts_n_meas)[0]
            flat = freq_t.reshape(-1)
            b = flat + delta
            if clip_b:
                b = jnp.clip(b, _EPS, 1 - _EPS)
            b = b - base_offset
            return jnp.min(b - polytope_prod) > -_EPS

        return jax.lax.map(one_level, conf_levels)

    return per_trial


def test_qst(state, conf_levels, n_measurements=1000, n_trials=1000, key=None):
    """Empirical coverage of the state confidence polytope
    (reference verification.py:9-37). Returns per-level coverage in [0, 1].
    """
    if key is None:
        key = jax.random.key(0)
    dim = 2**state.n_qubits
    povm_matrix = generate_measurement_matrix("proj-set", state.n_qubits)
    m = povm_matrix.shape[0]
    n_meas = np.full(m, n_measurements, dtype=np.float64)

    povm_flat = (
        povm_matrix * n_meas[:, None, None] / n_meas.sum()
    ).reshape(-1, povm_matrix.shape[-1]) * m
    a_matrix = povm_flat[:, 1:] * dim
    polytope_prod = jnp.asarray(
        a_matrix @ np.asarray(state.bloch[1:]), dtype=rdtype()
    )
    base_offset = jnp.asarray(povm_flat[:, 0], dtype=rdtype())

    bloch = jnp.asarray(state.bloch, dtype=rdtype())
    blochs = jnp.broadcast_to(bloch, (n_trials,) + bloch.shape)
    counts = state_core.simulate_experiment(
        key, jnp.asarray(povm_matrix, rdtype()), blochs, jnp.asarray(n_meas, rdtype())
    )
    freq = jnp.clip(
        counts / jnp.asarray(n_meas, rdtype())[:, None], _EPS, 1 - _EPS
    )
    per_trial = _coverage(
        polytope_prod, base_offset, freq, jnp.asarray(n_meas, rdtype()),
        conf_levels, clip_b=True,
    )
    hits = jax.jit(jax.vmap(per_trial))(freq)
    return np.asarray(jnp.mean(hits.astype(rdtype()), axis=0), dtype=np.float64)


def test_qpt(channel, conf_levels, n_measurements=1000, n_trials=1000,
             input_states="sic", key=None):
    """Empirical coverage of the process confidence polytope
    (reference verification.py:40-78)."""
    from ..process import ProcessTomograph

    if key is None:
        key = jax.random.key(1)
    tmg = ProcessTomograph(channel, input_states=input_states)
    n = channel.n_qubits
    dim = 4**n
    bloch_indices = [i for i in range(dim**2) if i % dim != 0]

    povm_matrix = generate_measurement_matrix("proj-set", n)
    m = povm_matrix.shape[0]
    n_meas = np.full(m, n_measurements, dtype=np.float64)

    meas_flat = (
        povm_matrix * n_meas[:, None, None] / n_meas.sum()
    ).reshape(-1, povm_matrix.shape[-1]) * m
    states_matrix = tmg._input_blochs_t()
    a_matrix = (
        np.einsum("ia,jb->ijab", states_matrix, meas_flat[:, 1:]) * dim
    ).reshape(states_matrix.shape[0] * meas_flat.shape[0], -1)
    polytope_prod = jnp.asarray(
        a_matrix @ np.asarray(channel.choi.bloch)[bloch_indices], dtype=rdtype()
    )
    base_offset = jnp.asarray(
        np.tile(meas_flat[:, 0], states_matrix.shape[0]), dtype=rdtype()
    )

    out_blochs = np.stack(
        [channel.transform(s).bloch for s in tmg.input_basis.elements]
    )
    blochs = jnp.broadcast_to(
        jnp.asarray(out_blochs, rdtype()), (n_trials,) + out_blochs.shape
    )
    counts = state_core.simulate_experiment(
        key, jnp.asarray(povm_matrix, rdtype()), blochs, jnp.asarray(n_meas, rdtype())
    )
    freq = jnp.clip(
        counts / jnp.asarray(n_meas, rdtype())[:, None], _EPS, 1 - _EPS
    )
    per_trial = _coverage(
        polytope_prod, base_offset, freq, jnp.asarray(n_meas, rdtype()),
        conf_levels, clip_b=False,
    )
    hits = jax.jit(jax.vmap(per_trial))(freq)
    return np.asarray(jnp.mean(hits.astype(rdtype()), axis=0), dtype=np.float64)
