"""CLI: point estimate + confidence intervals from real QST records.

Counterpart of reference scripts/state_interval.py:10-72. Reads a JSON
document with `povm_matrix` and `outcomes`, seeds a StateTomograph with the
measurement design, injects the real counts through the `results` setter,
and emits the bloch vector of the estimate plus (optionally) fidelity bands
and Hilbert-Schmidt radii.
"""

from __future__ import annotations

import math

import numpy as np

from ..qobj import Qobj, fully_mixed
from ..tomography.interval import MomentFidelityStateInterval, MomentInterval
from ..tomography.state import StateTomograph
from .common import build_parser, emit, load_input, validate_record


def run(input_data: dict, no_ci: bool = False) -> dict:
    validate_record(input_data, "state")
    results = np.asarray(input_data["outcomes"], dtype=np.float64)
    povm_matrix = np.asarray(input_data["povm_matrix"], dtype=np.float64)
    n_qubits = int(round(math.log2(povm_matrix.shape[-1]) / 2))

    tmg = StateTomograph(fully_mixed(n_qubits))
    tmg.povm_matrix = povm_matrix
    tmg.results = results

    output: dict = {}
    output["state"] = [
        float(x) for x in tmg.point_estimate(physical=False).bloch
    ]
    if no_ci:
        return output

    if "target_state" in input_data:
        interval = MomentFidelityStateInterval(
            tmg, target_state=Qobj(np.asarray(input_data["target_state"]))
        )
        interval.setup()
        (fmin, fmax), _ = interval(np.asarray(input_data["conf_levels"]))
        output["fidelity_min"] = [float(x) for x in np.maximum(fmin, 0)]
        output["fidelity_max"] = [float(x) for x in np.minimum(fmax, 1)]
    else:
        interval = MomentInterval(tmg)
        interval.setup()
    dist = interval.cl_to_dist(np.asarray(input_data.get("conf_levels", [0.95])))
    output["hs_radius"] = [float(x) for x in np.atleast_1d(dist)]
    return output


def main(args=None):
    parsed = build_parser(__doc__).parse_args(args)
    emit(run(load_input(parsed.input), no_ci=parsed.no_ci), parsed.output)


if __name__ == "__main__":
    main()
