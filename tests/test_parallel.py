"""Sharded bootstrap over the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

import quantpy_tpu as qt
from quantpy_tpu.parallel import (
    make_mesh,
    povm_sharded_probabilities,
    sharded_bootstrap_distances,
)
from quantpy_tpu.tomography.bootstrap_core import bootstrap_distances
from quantpy_tpu.tomography.state import StateTomograph


@pytest.fixture(scope="module")
def design():
    tmg = StateTomograph(qt.GHZ(2), key=11)
    tmg.experiment(2000, "proj-set")
    est = tmg.point_estimate("lin")
    return tmg, est


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("method", ["lin", "mle-rhor"])
def test_sharded_bootstrap_matches_statistics(design, method):
    tmg, est = design
    mesh = make_mesh()
    d_sharded = np.asarray(
        sharded_bootstrap_distances(
            mesh,
            jax.random.key(0),
            est.bloch,
            tmg.povm_matrix,
            tmg.n_measurements,
            n_points=64,
            method=method,
        )
    )
    assert d_sharded.shape == (64,)
    assert np.all(d_sharded >= 0) and np.all(d_sharded < 0.5)
    # statistically consistent with the single-device bootstrap
    d_single = np.asarray(
        bootstrap_distances(
            jax.random.key(1),
            est.bloch,
            tmg.povm_matrix,
            tmg.n_measurements,
            n_points=64,
            method=method,
        )
    )
    assert abs(np.median(d_sharded) - np.median(d_single)) < 0.05


def test_sharded_bootstrap_validates_divisibility(design):
    tmg, est = design
    mesh = make_mesh()
    with pytest.raises(ValueError):
        sharded_bootstrap_distances(
            mesh, jax.random.key(0), est.bloch, tmg.povm_matrix,
            tmg.n_measurements, n_points=63,
        )


def test_povm_sharded_probabilities(design):
    tmg, est = design
    mesh = make_mesh()
    from quantpy_tpu.tomography.state_core import weighted_povm_flat

    w = np.asarray(weighted_povm_flat(tmg.povm_matrix, tmg.n_measurements))
    # pad rows to a multiple of 8 for even sharding
    pad = (-w.shape[0]) % 8
    w_pad = np.vstack([w, np.zeros((pad, w.shape[1]))])
    p = np.asarray(povm_sharded_probabilities(mesh, w_pad, est.bloch))
    np.testing.assert_allclose(p, w_pad @ est.bloch, atol=1e-10)
