"""Bayesian mean estimation: validity, credible coverage, low-shot advantage."""

import numpy as np
import pytest

import quantpy_tpu as qt
from quantpy_tpu.tomography.bayes import bayesian_mean_estimate


def test_bme_basic():
    tmg = qt.StateTomograph(qt.GHZ(1), key=201)
    tmg.experiment(500, "proj-set")
    rho, radius, diag = bayesian_mean_estimate(
        tmg, n_samples=300, n_chains=4, burn_steps=300
    )
    assert rho.is_density_matrix()
    assert 0 < radius < 0.5
    assert 0.05 < diag["acceptance_rate"] < 0.95
    assert float(qt.hs_dst(rho, tmg.state)) < 0.15


def test_bme_low_shot_properties():
    """Posterior means are competitive with the MLE and strictly interior
    (full rank) — the signature BME property: unlike the MLE, which rails
    against the state-space boundary at low shot counts, the posterior mean
    never assigns probability zero to any outcome."""
    for i in range(6):
        tmg = qt.StateTomograph(qt.zero(1), key=300 + i)
        tmg.experiment(30, "proj-set")
        mle = tmg.point_estimate("mle-rhor")
        bme, _, _ = bayesian_mean_estimate(
            tmg, n_samples=200, n_chains=4, burn_steps=200
        )
        d_mle = float(qt.hs_dst(mle, tmg.state))
        d_bme = float(qt.hs_dst(bme, tmg.state))
        assert d_bme < max(1.5 * d_mle, 0.12)  # competitive
        assert np.linalg.eigvalsh(bme.matrix).min() > 1e-4  # interior


def test_bme_credible_radius_covers():
    """The credible radius should cover the truth at roughly its level."""
    covered = 0
    for i in range(10):
        tmg = qt.StateTomograph(qt.Qobj(np.array([0.5, 0.2, 0.1, 0.15])), key=400 + i)
        tmg.experiment(300, "proj-set")
        bme, radius, _ = bayesian_mean_estimate(
            tmg, n_samples=200, n_chains=4, burn_steps=300, credible_level=0.9
        )
        if float(qt.hs_dst(bme, tmg.state)) <= radius:
            covered += 1
    assert covered >= 6
