"""Bayesian mean estimation (BME) for state tomography.

Beyond-parity capability (the reference has no Bayesian estimator; see
PAPERS.md — Practical Bayesian Tomography, arXiv:1509.03770, and the
pseudo-Bayesian MCMC treatment of arXiv:2106.00577): the posterior over
density matrices is sampled with the framework's Metropolis chain
(Cholesky parametrization, count-weighted likelihood, uniform-over-
parametrization prior) and the estimate is the posterior mean — which is
admissible and typically beats the MLE at low shot counts, where the MLE
rails against the boundary of the state space.

TPU-native design: `n_chains` independent chains run vmapped in parallel
(one jitted program), each with its own burn-in; the posterior mean and a
credible radius come from the pooled samples.
"""

from __future__ import annotations

import numpy as np

from ..mhmc import MHMC, normalized_update
from ..ops.cholesky import np_matrix_to_real_tril_vec
from ..qobj import Qobj
from . import bootstrap_core

__all__ = ["bayesian_mean_estimate"]


def bayesian_mean_estimate(
    tmg,
    n_samples: int = 500,
    n_chains: int = 8,
    step: float = 0.02,
    burn_steps: int = 500,
    thinning: int = 2,
    adapt_step: bool = True,
    credible_level: float = 0.9,
    key=None,
):
    """Posterior-mean state estimate with a credible radius.

    Parameters
    ----------
    tmg : StateTomograph with results
    n_samples : samples kept per chain
    n_chains : vmapped parallel chains (pooled)
    credible_level : level of the reported posterior credible radius
        (hs distance of samples to the posterior mean)

    Returns
    -------
    (rho_bme : Qobj, credible_radius : float, diagnostics : dict)
    """
    if tmg.results is None:
        raise RuntimeError("Run `experiment` or set `results` first")
    n_qubits = tmg.state.n_qubits
    dim = 2**n_qubits
    # start at the (feasible) MLE and sample the count-weighted posterior
    start = tmg.point_estimate("mle-rhor")
    mat = start.matrix + 1e-7 * np.eye(dim)
    mat = mat / np.trace(mat).real
    x_init = np_matrix_to_real_tril_vec(mat)
    n_total = float(np.sum(tmg.n_measurements))
    chain = MHMC(
        lambda x: -n_total * tmg._nll(x),
        step=step,
        burn_steps=burn_steps,
        dim=dim * dim,
        update_rule=normalized_update,
        symmetric=True,
        x_init=x_init,
        key=key,
    )
    if adapt_step:
        chain.adapt_step()
    samples, acceptance = chain.sample_chains(n_samples, n_chains, thinning)
    tril = samples.reshape(-1, dim * dim)
    # posterior mean in bloch space (jitted decode + normalize)
    from ..config import rdtype
    import jax.numpy as jnp

    from ..ops.cholesky import real_tril_vec_to_matrix
    from ..ops.paulis import matrix_to_bloch
    import jax

    @jax.jit
    def decode(vecs):
        rho = real_tril_vec_to_matrix(jnp.asarray(vecs, rdtype()), dim)
        tr = jnp.trace(rho, axis1=-2, axis2=-1).real
        return matrix_to_bloch(rho) / tr[..., None]

    blochs = np.asarray(decode(tril), dtype=np.float64)
    mean_bloch = blochs.mean(axis=0)
    rho_bme = Qobj(mean_bloch)
    dists = np.sort(
        np.asarray(
            bootstrap_core._distance_batch("hs", blochs, mean_bloch, n_qubits)
        )
    )
    radius = float(np.quantile(dists, credible_level))
    diagnostics = {
        "acceptance_rate": acceptance,
        "step": chain.step,
        "n_pooled_samples": blochs.shape[0],
        "mean_hs_to_mle": float(
            bootstrap_core._distance_batch(
                "hs", mean_bloch[None], np.asarray(start.bloch), n_qubits
            )[0]
        ),
    }
    return rho_bme, radius, diagnostics
