"""Exact multinomial moments of the weighted squared L2 error ||f - p||_W^2.

Counterpart of reference quantpy/stats.py:4-52, used by MomentInterval.
`freq` is the (n_povms, n_outcomes) MLE frequency estimate of multinomial
parameters p with `n_trials` shots per POVM; `weights` is the 4-index tensor
W[a,i,b,j] so that the statistic is sum_{ai,bj} W (f-p)_{ai} (f-p)_{bj}.

The second moment is the sum of twelve Isserlis-style contractions of the
multinomial covariance structure; the contraction set matches the reference
(verified term-by-term in tests against reference l2_mean/l2_variance).
Implemented in numpy: the tensors are tiny (m*p <= hundreds) and this runs
once per interval setup, not in the hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["l2_mean", "l2_variance", "l2_first_moment", "l2_second_moment"]


def _identity_weights(freq: np.ndarray) -> np.ndarray:
    m, p = freq.shape
    w = np.einsum("ab,ij->aibj", np.eye(m), np.eye(p))
    return w


def l2_first_moment(freq, n_trials, weights) -> float:
    """E ||f - p||_W^2 under the multinomial model (reference stats.py:21-26)."""
    diag = np.einsum("aiai,ai->", weights, freq)
    cross = np.einsum("aiaj,ai,aj->", weights, freq, freq)
    return (diag - cross) / n_trials


def l2_second_moment(freq, n_trials, weights) -> float:
    """E (||f - p||_W^2)^2 (reference stats.py:29-48): all pairings of the
    fourth multinomial central moment that survive independence between
    distinct POVMs — same-POVM pairs plus the two 2/2 splits."""
    w, f = weights, freq
    terms = (
        # both quadratic forms within their own POVMs
        +np.einsum("aiaj,bkbl,ai,aj,bk,bl->", w, w, f, f, f, f)
        - np.einsum("aiaj,bkbk,ai,aj,bk->", w, w, f, f, f)
        - np.einsum("aiai,bkbl,ai,bk,bl->", w, w, f, f, f)
        + np.einsum("aiai,bkbk,ai,bk->", w, w, f, f)
        # split pairing (a i | b j)(b k | a l)
        + np.einsum("aibj,bkal,ai,bj,bk,al->", w, w, f, f, f, f)
        - np.einsum("aibj,bjal,ai,bj,al->", w, w, f, f, f)
        - np.einsum("aibj,bkai,ai,bj,bk->", w, w, f, f, f)
        + np.einsum("aibj,bjai,ai,bj->", w, w, f, f)
        # split pairing (a i | b j)(a k | b l)
        + np.einsum("aibj,akbl,ai,bj,ak,bl->", w, w, f, f, f, f)
        - np.einsum("aibj,akbj,ai,bj,ak->", w, w, f, f, f)
        - np.einsum("aibj,aibl,ai,bj,bl->", w, w, f, f, f)
        + np.einsum("aibj,aibj,ai,bj->", w, w, f, f)
    )
    return terms / n_trials**2


def l2_mean(freq, n_trials, weights=None) -> float:
    """Mean of ||f - p||_W^2 (reference stats.py:5-10)."""
    freq = np.asarray(freq, dtype=np.float64)
    if weights is None:
        weights = _identity_weights(freq)
    return l2_first_moment(freq, n_trials, weights)


def l2_variance(freq, n_trials, weights=None) -> float:
    """Variance of ||f - p||_W^2 (reference stats.py:13-18)."""
    freq = np.asarray(freq, dtype=np.float64)
    if weights is None:
        weights = _identity_weights(freq)
    return l2_second_moment(freq, n_trials, weights) - l2_first_moment(
        freq, n_trials, weights
    ) ** 2
