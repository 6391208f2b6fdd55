"""CLI: process point estimate + confidence intervals from real QPT records.

Counterpart of reference scripts/process_interval.py:10-73. Reads a JSON
document with `povm_matrix`, `input_states`, and per-input-state `outcomes`,
builds a ProcessTomograph over the given input basis, injects the counts,
and emits the Choi bloch vector plus (optionally) fidelity bands and
Hilbert-Schmidt radii.
"""

from __future__ import annotations

import math

import numpy as np

from ..channel import Channel, depolarizing
from ..qobj import Qobj
from ..tomography.interval import MomentFidelityProcessInterval, MomentInterval
from ..tomography.process import ProcessTomograph
from .common import build_parser, emit, load_input, validate_record


def run(input_data: dict, no_ci: bool = False) -> dict:
    validate_record(input_data, "process")
    results = np.asarray(input_data["outcomes"], dtype=np.float64)
    povm_matrix = np.asarray(input_data["povm_matrix"], dtype=np.float64)
    n_qubits = int(round(math.log2(povm_matrix.shape[-1]) / 2))

    input_states = [Qobj(np.asarray(b)) for b in input_data["input_states"]]
    # the channel argument only seeds the simulator (the reference uses a
    # depolarizing placeholder the same way, scripts/process_interval.py:44)
    tmg = ProcessTomograph(depolarizing(n_qubits=n_qubits), input_states=input_states)
    # fix the measurement design directly from the records (no simulation)
    tmg.tomographs = []
    from ..tomography.state import StateTomograph

    for s, counts in zip(input_states, results):
        child = StateTomograph(tmg.channel.transform(s))
        child.povm_matrix = povm_matrix
        child.results = counts
        tmg.tomographs.append(child)

    output: dict = {}
    est = tmg.point_estimate(cptp=False)
    output["process"] = [float(x) for x in est.choi.bloch]
    if no_ci:
        return output

    if "target_process" in input_data:
        target = Channel(Qobj(np.asarray(input_data["target_process"])))
        interval = MomentFidelityProcessInterval(tmg, target_process=target)
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
