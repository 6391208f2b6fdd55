"""The bundled real-measurement-record workflow (examples/real_records.py)
runs in CI: raw counts -> results setter -> estimates -> interval stack.
Counterpart of the reference's real-data notebooks (Ion Data.ipynb, IBM
teleportation.ipynb), whose raw data files the reference does not ship."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "examples"))

from real_records import analyze_process_record, analyze_state_record  # noqa: E402


def test_state_record_workflow():
    out = analyze_state_record(n_boot=64)
    # hidden over-rotation + depolarization + readout noise: high but
    # clearly imperfect fidelity
    assert 0.85 < out["fidelity_to_target"] < 0.995
    for key in ("moment_radius", "sugiyama_radius", "bootstrap_radius"):
        r = np.asarray(out[key])
        assert np.all(np.isfinite(r)) and np.all(r >= 0)
        assert np.all(np.diff(r) >= -1e-9)
    fmin, fmax = np.asarray(out["polytope_fidelity_band"])
    assert np.all(fmin <= fmax + 1e-6)


def test_process_record_workflow():
    out = analyze_process_record(n_boot=16)
    # 4% depolarization + readout confusion on a CNOT
    assert 0.8 < out["entanglement_fidelity"] < 0.99
    fmin, fmax = np.asarray(out["moment_fidelity_band"])
    assert np.all(fmin <= fmax + 1e-6)
    # the band at high confidence should bracket the point fidelity
    assert fmin[-1] - 0.05 <= out["entanglement_fidelity"] <= fmax[-1] + 0.05
    r = np.asarray(out["bootstrap_radius"])
    assert np.all(np.isfinite(r)) and np.all(np.diff(r) >= -1e-9)
