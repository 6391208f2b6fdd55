"""Coverage verification harness + calibration metrics."""

import numpy as np
import pytest

import quantpy_tpu as qt
from quantpy_tpu.channel import depolarizing
from quantpy_tpu.metrics import get_CL_list_channel, get_CL_list_state
from quantpy_tpu.tomography.polytopes.verification import (
    test_qpt as coverage_qpt,
    test_qst as coverage_qst,
)


def test_qst_coverage_ghz():
    """Polytope coverage must dominate the nominal level (the bound is
    conservative): reproduces the reference's fig1a-style check."""
    conf_levels = np.array([0.5, 0.8, 0.95])
    cov = coverage_qst(qt.GHZ(2), conf_levels, n_measurements=500, n_trials=300)
    assert cov.shape == (3,)
    assert np.all(cov >= conf_levels - 0.05)
    assert np.all(np.diff(cov) >= -0.05)


def test_qpt_coverage_depolarizing():
    conf_levels = np.array([0.5, 0.9])
    cov = coverage_qpt(
        depolarizing(0.4), conf_levels, n_measurements=500, n_trials=200,
        input_states="sic",
    )
    assert np.all(cov >= conf_levels - 0.07)


def test_calibration_state_moment():
    levels = get_CL_list_state(
        qt.GHZ(1), interval="moment", n_measurements=800, n_iter=40
    )
    assert levels.shape == (40,)
    assert np.all((0 <= levels) & (levels <= 1))
    # calibrated intervals: achieved levels roughly uniform; mean in (0.2, 0.8)
    assert 0.2 < levels.mean() < 0.8


def test_calibration_channel_moment():
    levels = get_CL_list_channel(
        depolarizing(0.3), interval="moment", n_measurements=800, n_iter=15
    )
    assert levels.shape == (15,)
    assert np.all((0 <= levels) & (levels <= 1))


def test_calibration_unknown_interval():
    with pytest.raises(KeyError):
        get_CL_list_state(qt.GHZ(1), interval="bogus", n_iter=1)


import os
import pickle

REF_PICKLE = "/root/reference/polytopes/results/states_qubits_10k.pkl"


@pytest.mark.skipif(not os.path.exists(REF_PICKLE), reason="no reference pickle")
def test_coverage_matches_published_curve():
    """Reproduce the reference's published GHZ-1 coverage curve
    (arXiv:2109.04734 fig 1a data, polytopes/results/states_qubits_10k.pkl)
    within Monte-Carlo tolerance (full 10^4-trial comparison in
    docs/benchmarks.md reaches <= 0.011 on every curve)."""
    with open(REF_PICKLE, "rb") as f:
        ref_data = pickle.load(f)
    conf = np.asarray(ref_data["cl"])
    published = np.asarray(ref_data["results"][0])
    ours = coverage_qst(qt.GHZ(1), conf, n_measurements=10_000, n_trials=1500)
    assert np.max(np.abs(ours - published)) < 0.035
