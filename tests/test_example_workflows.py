"""The fidelity-sweep and IBMQ-teleportation example workflows
(examples/fidelity_intervals.py, examples/teleportation.py) run in CI.
Counterparts of the reference's notebooks/Fidelity.ipynb and
notebooks/Teleportation.ipynb."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))

import fidelity_intervals  # noqa: E402
import teleportation  # noqa: E402


def test_state_fidelity_sweep_covers_truth():
    epsilons = np.logspace(-4, -0.05, 12)
    true_fid, bands = fidelity_intervals.state_fidelity_sweep(
        epsilons, n_shots=10_000, repeats=3, key0=700
    )
    assert abs(true_fid - 0.925) < 1e-9  # the notebook's headline value
    fmin = np.stack([b[0] for b in bands])
    fmax = np.stack([b[1] for b in bands])
    assert np.all(fmin <= fmax + 1e-9)
    # high-confidence (small-epsilon) bands should cover the true fidelity
    assert np.all(fmin[:, 0] <= true_fid + 1e-6)
    assert np.all(fmax[:, 0] >= true_fid - 1e-6)


def test_process_fidelity_sweep_covers_truth():
    epsilons = np.logspace(-4, -0.05, 12)
    true_fid, bands = fidelity_intervals.process_fidelity_sweep(
        epsilons, n_shots=10_000, repeats=3, key0=900
    )
    fmin = np.stack([b[0] for b in bands])
    fmax = np.stack([b[1] for b in bands])
    assert np.all(fmin <= fmax + 1e-9)
    assert np.all(fmin[:, 0] <= true_fid + 1e-6)
    assert np.all(fmax[:, 0] >= true_fid - 1e-6)


def test_teleportation_record_reconstruction():
    from quantpy_tpu.operator import Id

    import quantpy_tpu as qt

    target = Id.as_channel()
    tmg = qt.ProcessTomograph(
        target, input_states=teleportation.tetrahedral_input_states(), key=17
    )
    tmg.experiment(8192, teleportation.calibrated_povm_matrix())
    tmg.results = teleportation.IBM_COUNTS
    est = tmg.point_estimate("lifp")
    fid = float(np.dot(target.choi.bloch, est.choi.bloch))
    # the published IBMQ teleportation run: clearly sub-unit but real
    assert 0.75 < fid < 0.95
    band = qt.MomentFidelityProcessInterval(tmg, target_process=target)
    (fmin, fmax), _ = band(np.array([0.5, 0.95]))
    assert np.all(np.asarray(fmin) <= fid + 0.05)
    assert np.all(np.asarray(fmax) >= fid - 0.05)


def test_tetrahedral_states_form_basis():
    states = teleportation.tetrahedral_input_states()
    blochs = np.stack([np.asarray(s.bloch, dtype=np.float64) for s in states])
    assert np.linalg.matrix_rank(blochs) == 4


def test_calibrated_povm_completeness():
    povm = teleportation.calibrated_povm_matrix()
    assert povm.shape == (3, 2, 4)
    # each measurement's effects sum to the identity bloch row [1, 0, 0, 0]
    np.testing.assert_allclose(
        povm.sum(axis=1), np.tile([1.0, 0, 0, 0], (3, 1)), atol=1e-12
    )


def test_posterior_sampling_example_smoke():
    """examples/posterior_sampling.py at a tiny budget: the anchored
    kraus chain and the bootstrap land on the same scale, and the scipy
    frozen proposal drives a state chain end-to-end."""
    import warnings

    import posterior_sampling  # noqa: E402

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # short-chain R-hat
        cd, bd, r_hat, ess = posterior_sampling.process_posterior(
            n_qubits=1, n_shots=500, n_points=80, burn_steps=200, n_boot=60
        )
    assert np.all(np.isfinite(cd)) and np.all(np.isfinite(bd))
    assert cd[0] < 5 * bd[1] and bd[0] < 5 * max(cd[1], 1e-3)
    d = posterior_sampling.scipy_proposal_state_chain()
    assert np.all(np.isfinite(d)) and d.shape == (2,)
