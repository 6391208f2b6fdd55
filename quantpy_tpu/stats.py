"""Moments of the weighted squared L2 error ||f - p||_W^2 under the
multinomial measurement model (used by MomentInterval).

Counterpart of reference quantpy/stats.py:4-52, but DERIVED differently —
from the Gaussian quadratic-form identities instead of enumerating moment
contractions:

Let x = f_obs - p be the centered outcome frequencies of m independent
multinomials with n_trials shots each. The CLT gives x ~ N(0, Sigma / N)
with the block-diagonal multinomial covariance

    Sigma[ai, bj] = delta_ab (delta_ij f_ai - f_ai f_aj)

(plug-in estimate at the observed frequencies, as in the reference). For a
Gaussian vector and the quadratic form Q = x^T W x, Isserlis' theorem gives
the classical identities

    E[Q]   = tr(W Sigma) / N
    E[Q^2] = ( tr(W Sigma)^2 + 2 tr((W Sigma)^2) ) / N^2.

The reference's twelve einsum contractions (quantpy/stats.py:28-48) are the
fully expanded form of these two traces; equality is verified numerically in
tests/test_convex_and_stats.py (term parity + a Monte-Carlo property test
against brute-force sampled moments).

When W = V^T V comes from a measurement-map pseudo-inverse V of shape
(D, m, p) — exactly the MomentInterval case — the traces collapse once more.
With T[d, a] = sum_i V[d,ai] f[ai] and

    R = V diag(f) V^T           (R[d,e] = sum_ai V[d,ai] V[e,ai] f[ai])
    S = T T^T

one has V Sigma V^T = R - S, hence

    E[Q] = tr(R - S) / N,     Var[Q] = 2 ||R - S||_F^2 / N^2.

This form (:func:`l2_moments_from_factor`) never materializes the (mp)^2
weights tensor the reference builds (reference interval.py:88) and
factorizes over Kronecker-product designs (see tomography/kron_analytic.py).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "l2_mean",
    "l2_variance",
    "l2_first_moment",
    "l2_second_moment",
    "l2_moments_from_factor",
    "make_identity_weights",
]


def make_identity_weights(freq: np.ndarray) -> np.ndarray:
    """Identity weights tensor W[ai, bj] = delta_ab delta_ij for an (m, p)
    frequency table (API parity with reference quantpy/stats.py)."""
    m, p = np.asarray(freq).shape
    return np.einsum("ab,ij->aibj", np.eye(m), np.eye(p))


_identity_weights = make_identity_weights


def _w_sigma(weights: np.ndarray, freq: np.ndarray) -> np.ndarray:
    """The (mp, mp) matrix W Sigma with Sigma the block-diagonal multinomial
    covariance at plug-in frequencies f."""
    m, p = freq.shape
    w = np.asarray(weights, dtype=np.float64).reshape(m * p, m * p)
    f = np.asarray(freq, dtype=np.float64)
    # (W Sigma)[ai, bj] = W[ai,bj] f[bj] - (sum_k W[ai,bk] f[bk]) f[bj]
    w4 = w.reshape(m * p, m, p)
    wf = np.einsum("xbk,bk->xb", w4, f)  # sum_k W[x, bk] f[bk]
    ws = w4 * f[None, :, :] - wf[:, :, None] * f[None, :, :]
    return ws.reshape(m * p, m * p)


def l2_first_moment(freq, n_trials, weights) -> float:
    """E ||f - p||_W^2 = tr(W Sigma) / N (reference stats.py:21-26 agrees
    term-for-term after expanding the trace)."""
    return float(np.trace(_w_sigma(weights, freq))) / n_trials


def l2_second_moment(freq, n_trials, weights) -> float:
    """E (||f - p||_W^2)^2 = (tr(W Sigma)^2 + 2 tr((W Sigma)^2)) / N^2
    (the reference's twelve contractions, reference stats.py:29-48, are the
    expansion of these traces)."""
    ws = _w_sigma(weights, freq)
    t = np.trace(ws)
    # tr((W Sigma)^2) = <WS, (WS)^T>; avoids the explicit matrix product
    t2 = float(np.sum(ws * ws.T))
    return (t * t + 2.0 * t2) / n_trials**2


def l2_moments_from_factor(v, freq, n_trials) -> tuple[float, float]:
    """(mean, variance) of ||f - p||_W^2 for W = V^T V, without forming W.

    Parameters
    ----------
    v : (D, m, p) real factor (e.g. the measurement-map pseudo-inverse)
    freq : (m, p) observed frequencies
    n_trials : shots per POVM

    Returns mean = tr(R - S)/N and variance = 2 ||R - S||_F^2 / N^2 with
    R = V diag(f) V^T, S = (V f)(V f)^T partial-contracted per POVM (see
    module docstring).
    """
    v = np.asarray(v, dtype=np.float64)
    f = np.asarray(freq, dtype=np.float64)
    r = np.einsum("dai,eai,ai->de", v, v, f, optimize=True)
    t = np.einsum("dai,ai->da", v, f, optimize=True)
    m = r - t @ t.T
    mean = float(np.trace(m)) / n_trials
    variance = 2.0 * float(np.sum(m * m)) / n_trials**2
    return mean, variance


def l2_mean(freq, n_trials, weights=None) -> float:
    """Mean of ||f - p||_W^2 (API of reference stats.py:5-10)."""
    freq = np.asarray(freq, dtype=np.float64)
    if weights is None:
        weights = _identity_weights(freq)
    return l2_first_moment(freq, n_trials, weights)


def l2_variance(freq, n_trials, weights=None) -> float:
    """Variance of ||f - p||_W^2 (API of reference stats.py:13-18)."""
    freq = np.asarray(freq, dtype=np.float64)
    if weights is None:
        weights = _identity_weights(freq)
    return l2_second_moment(freq, n_trials, weights) - l2_first_moment(
        freq, n_trials, weights
    ) ** 2
