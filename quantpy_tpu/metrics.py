"""CI-calibration harness: achieved confidence levels of interval methods.

The reference's metrics.py targets a deleted tomograph API
(`tmg.gamma_interval` / `tmg.mhmc` / `tmg.bootstrap`, reference
metrics.py:131-137, 288-309 — stale, SURVEY.md section 2 #21). This module
provides the same *capability* — calibration-curve data for any interval
family — on the current interval-class API:

For `n_iter` independent simulated experiments, reconstruct a point
estimate, build the chosen interval, and record the confidence level that
its distance map assigns to the ACTUAL distance between estimate and truth.
Sorted levels plotted against the uniform quantiles give the calibration
curve (diagonal = perfectly calibrated).
"""

from __future__ import annotations

import numpy as np

from .tomography.interval import (
    BootstrapProcessInterval,
    BootstrapStateInterval,
    MHMCProcessInterval,
    MHMCStateInterval,
    MomentInterval,
    SugiyamaInterval,
)
from .tomography.process import ProcessTomograph
from .tomography.state import StateTomograph

__all__ = ["get_CL_list_state", "get_CL_list_channel", "STATE_INTERVALS",
           "CHANNEL_INTERVALS"]

# Only distance-valued intervals can be calibration-inverted; the polytope
# and moment-fidelity intervals return fidelity BANDS and are excluded.
STATE_INTERVALS = {
    "moment": MomentInterval,
    "sugiyama": SugiyamaInterval,
    "bootstrap": BootstrapStateInterval,
    "mhmc": MHMCStateInterval,
}

CHANNEL_INTERVALS = {
    "moment": MomentInterval,
    "bootstrap": BootstrapProcessInterval,
    "mhmc": MHMCProcessInterval,
}


def _achieved_level(interval, dist_value: float) -> float:
    """Invert the interval's cl -> dist map at the observed distance."""
    grid = np.linspace(1e-3, 1 - 1e-3, 512)
    dists, _ = interval(grid)
    dists = np.asarray(dists, dtype=np.float64)
    return float(np.interp(dist_value, dists, grid))


def get_CL_list_state(  # noqa: N802 - reference API name (metrics.py:8)
    state,
    interval: str = "moment",
    n_measurements: int = 1000,
    povm: str = "proj-set",
    n_iter: int = 100,
    method: str = "lin",
    key: int = 0,
    **interval_kwargs,
):
    """Sorted achieved confidence levels for a state-interval family
    (capability of reference metrics.py:8-147)."""
    cls = STATE_INTERVALS[interval]
    levels = []
    for i in range(n_iter):
        tmg = StateTomograph(state, key=key * 100003 + i)
        tmg.experiment(n_measurements, povm)
        est = tmg.point_estimate(method)
        d = float(tmg.dst(est, state))
        iv = cls(tmg, **interval_kwargs)
        levels.append(_achieved_level(iv, d))
    return np.sort(np.asarray(levels))


def get_CL_list_channel(  # noqa: N802 - reference API name (metrics.py:150)
    channel,
    interval: str = "moment",
    n_measurements: int = 1000,
    povm: str = "proj-set",
    input_states: str = "proj4",
    n_iter: int = 100,
    method: str = "lifp",
    key: int = 0,
    **interval_kwargs,
):
    """Sorted achieved confidence levels for a channel-interval family
    (capability of reference metrics.py:150-319)."""
    cls = CHANNEL_INTERVALS[interval]
    levels = []
    for i in range(n_iter):
        tmg = ProcessTomograph(channel, input_states=input_states,
                               key=key * 100003 + i)
        tmg.experiment(n_measurements, povm)
        est = tmg.point_estimate(method)
        d = float(tmg.dst(est.choi, channel.choi))
        iv = cls(tmg, **interval_kwargs)
        levels.append(_achieved_level(iv, d))
    return np.sort(np.asarray(levels))
