"""Pallas kernel correctness (interpret mode on CPU) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantpy_tpu as qt
from quantpy_tpu.ops import kernels
from quantpy_tpu.tomography import state_core


@pytest.fixture(scope="module")
def flagship_problem():
    tmg = qt.StateTomograph(qt.GHZ(4), key=55)
    tmg.experiment(10000, "proj-set")
    counts = np.asarray(tmg.simulate_batch(8))
    return tmg, counts


def test_rhor_pallas_matches_xla(flagship_problem, monkeypatch):
    tmg, counts = flagship_problem
    # interpret mode: run the kernel logic on CPU
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(kernels.pl, "pallas_call", interp_call)

    w2 = np.asarray(
        state_core.weighted_povm_flat(tmg.povm_matrix, tmg.n_measurements)
    ) * 16
    freq = counts.reshape(counts.shape[0], -1)
    freq = freq / freq.sum(-1, keepdims=True)
    init = np.asarray(state_core.estimate_lin(counts, tmg.povm_matrix, tmg.n_measurements))
    mixed = np.zeros_like(init); mixed[:, 0] = 1 / 16
    bloch0 = 0.95 * init + 0.05 * mixed

    ours = np.asarray(
        kernels.rhor_mle_pallas(freq, bloch0, w2, n_iter=40, block_b=128)
    )
    # XLA reference: same fixed iteration (tol=0 -> run all iters)
    ref = np.asarray(
        state_core.estimate_mle_rhor(
            counts.astype(np.float32), tmg.povm_matrix, tmg.n_measurements,
            init_bloch=init.astype(np.float32), max_iter=40, tol=0.0,
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5)
    # estimates are physical: unit trace coordinate
    np.testing.assert_allclose(ours[:, 0], 1 / 16, atol=1e-6)


def test_rhor_pallas_flat_matches_xla(flagship_problem, monkeypatch):
    tmg, counts = flagship_problem
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(kernels.pl, "pallas_call", interp_call)

    w2 = np.asarray(
        state_core.weighted_povm_flat(tmg.povm_matrix, tmg.n_measurements)
    ) * 16
    freq = counts.reshape(counts.shape[0], -1)
    freq = freq / freq.sum(-1, keepdims=True)
    init = np.asarray(state_core.estimate_lin(counts, tmg.povm_matrix, tmg.n_measurements))
    mixed = np.zeros_like(init); mixed[:, 0] = 1 / 16
    bloch0 = 0.95 * init + 0.05 * mixed

    ours = np.asarray(
        kernels.rhor_mle_pallas_flat(freq, bloch0, w2, n_iter=40, block_b=128)
    )
    ref = np.asarray(
        state_core.estimate_mle_rhor(
            counts.astype(np.float32), tmg.povm_matrix, tmg.n_measurements,
            init_bloch=init.astype(np.float32), max_iter=40, tol=0.0,
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5)
    np.testing.assert_allclose(ours[:, 0], 1 / 16, atol=1e-6)


def test_rhor_pallas_rejects_small_dims():
    with pytest.raises(ValueError):
        kernels.rhor_mle_pallas(
            np.ones((4, 6)), np.ones((4, 4)), np.ones((6, 4)), n_iter=5
        )
