"""Confidence-interval family tour + calibration curves.

Counterpart of the reference's notebooks/Intervals.ipynb and
examples/confidence_intervals.ipynb: build every interval family on one
experiment, compare their radii, and compute a calibration curve with the
metrics harness.

Run:  python examples/confidence_intervals.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import quantpy_tpu as qt
from quantpy_tpu.metrics import get_CL_list_state


def main() -> None:
    tmg = qt.StateTomograph(qt.GHZ(2), key=11)
    tmg.experiment(3000, "proj-set")
    tmg.point_estimate("mle-rhor")

    conf_levels = np.array([0.5, 0.9, 0.99])
    intervals = {
        "moment (gamma)": qt.MomentInterval(tmg),
        "sugiyama": qt.SugiyamaInterval(tmg),
        "bootstrap-lin": qt.BootstrapStateInterval(tmg, n_points=512),
        "bootstrap-mle": qt.BootstrapStateInterval(
            tmg, n_points=512, method="mle-rhor"
        ),
        "mhmc": qt.MHMCStateInterval(
            tmg, n_points=500, burn_steps=500, use_new_estimate=True
        ),
    }
    print(f"{'interval':>14} | " + " | ".join(f"d@{c}" for c in conf_levels))
    for name, iv in intervals.items():
        d, _ = iv(conf_levels)
        print(f"{name:>14} | " + " | ".join(f"{x:.4f}" for x in np.asarray(d)))

    # fidelity band w.r.t. the true state
    fiv = qt.MomentFidelityStateInterval(tmg, target_state=tmg.state)
    (fmin, fmax), _ = fiv(conf_levels)
    print("\nfidelity band vs truth:")
    for c, lo, hi in zip(conf_levels, fmin, fmax):
        print(f"  {c:.2f}: [{lo:.4f}, {hi:.4f}]")

    # calibration: achieved confidence levels should be ~uniform
    levels = get_CL_list_state(
        qt.GHZ(1), interval="moment", n_measurements=1000, n_iter=40
    )
    quantiles = np.linspace(0, 1, len(levels))
    err = float(np.max(np.abs(levels - quantiles)))
    print(f"\nmoment-interval calibration: max |achieved - uniform| = {err:.3f}")


if __name__ == "__main__":
    main()
