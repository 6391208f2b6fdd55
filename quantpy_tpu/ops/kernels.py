"""Pallas TPU kernels for the hot estimator loops.

`rhor_mle_pallas` fuses the ENTIRE RrhoR maximum-likelihood iteration
(quantpy_tpu.tomography.state_core.estimate_mle_rhor, the flagship
bootstrap workload) into one kernel: every iterate — probabilities,
likelihood ratios, the R operator, the R rho R update and the
renormalization — lives in VMEM for all `n_iter` iterations, instead of
round-tripping batch x 1296 intermediates through HBM per iteration.

STATUS (2026-08-16, measured on the v5e target): correct under the Pallas
interpreter (tests/test_kernels.py), but the current Mosaic compiler
rejects the lane-splitting reshape a batched-matmul sandwich needs
("infer-vector-layout: unsupported shape cast" for
vector<128x256xf32> -> vector<128x16x16xf32> when the source is a matmul
result; verified minimal repro). The production path therefore stays in
XLA, where profiling this kernel's design led to the dense
Pauli-transfer-matmul + transposed-space formulation now used by
estimate_mle_rhor (109.6 ms -> 74.3 ms per 150x1024 iteration block,
19.1k bootstrapped 4-qubit MLE reconstructions/s end to end). Revisit when
Mosaic grows layout support for small-matrix batched reshapes.

Design notes (see docs/tpu_constraints.md and the Pallas guide):

- Everything is REAL f32. Complex density matrices are carried as
  (re, im) pairs. The Pauli-transfer matrix PTM (vec(P_i) columns) maps
  bloch -> vec(matrix); with column-stacking, `reshape(vec)` yields the
  TRANSPOSED matrix, and the transposed space is closed under the
  palindromic product R rho R ((R rho R)^T = R^T rho^T R^T for Hermitian
  factors), so the kernel works with transposed matrices throughout and
  never untransposes.
- The measurement matrix W2 (K x D) is zero-padded to lane-aligned
  K_pad (multiple of 128); padded rows have f = 0 and contribute nothing.
- Grid over batch tiles; W2 and the PTM pair are replicated per tile
  (about 2 MB of VMEM at the 4-qubit flagship size).

The kernel requires D = 4^n to be a multiple of 128 (n >= 4); callers fall
back to the XLA path for smaller systems, where the loop is cheap anyway.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paulis import _pauli_transfer_np

__all__ = ["rhor_mle_pallas", "pallas_supported"]

_EPS = 1e-10


def pallas_supported(dim2: int) -> bool:
    """Whether the fused kernel supports bloch dimension D = dim2."""
    return dim2 % 128 == 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rhor_kernel(f_ref, bloch0_ref, w2_ref, ptm_re_ref, ptm_im_ref, out_ref,
                 *, n_iter: int, d: int):
    bt = f_ref.shape[0]
    w2 = w2_ref[:]          # (K_pad, D)
    ptm_re = ptm_re_ref[:]  # (D, D)
    ptm_im = ptm_im_ref[:]
    f = f_ref[:]            # (Bt, K_pad)

    def to_mats(vecs):
        """bloch/vec-space rows (Bt, D) -> transposed-matrix pairs."""
        re = jnp.dot(vecs, ptm_re.T, preferred_element_type=jnp.float32)
        im = jnp.dot(vecs, ptm_im.T, preferred_element_type=jnp.float32)
        return re.reshape(bt, d, d), im.reshape(bt, d, d)

    def cmatmul(a_re, a_im, b_re, b_im):
        pe = jnp.float32
        re = jnp.einsum("bij,bjk->bik", a_re, b_re, preferred_element_type=pe) - \
            jnp.einsum("bij,bjk->bik", a_im, b_im, preferred_element_type=pe)
        im = jnp.einsum("bij,bjk->bik", a_re, b_im, preferred_element_type=pe) + \
            jnp.einsum("bij,bjk->bik", a_im, b_re, preferred_element_type=pe)
        return re, im

    def body(_, bloch):
        probs = jnp.dot(bloch, w2.T, preferred_element_type=jnp.float32)
        c = f / jnp.maximum(probs, _EPS)
        r_bloch = jnp.dot(c, w2, preferred_element_type=jnp.float32)
        r_re, r_im = to_mats(r_bloch)
        rho_re, rho_im = to_mats(bloch)
        s_re, s_im = cmatmul(r_re, r_im, rho_re, rho_im)
        t_re, t_im = cmatmul(s_re, s_im, r_re, r_im)
        vec_re = t_re.reshape(bt, d * d)
        vec_im = t_im.reshape(bt, d * d)
        # bloch_i = Re(<vec(P_i), vec(T)>)/d = (re.ptm_re + im.ptm_im)/d
        new = (
            jnp.dot(vec_re, ptm_re, preferred_element_type=jnp.float32)
            + jnp.dot(vec_im, ptm_im, preferred_element_type=jnp.float32)
        ) / d
        # unit trace: Tr(T) = d * bloch_0
        return new / (d * new[:, 0:1])

    out_ref[:] = jax.lax.fori_loop(0, n_iter, body, bloch0_ref[:])


@functools.partial(jax.jit, static_argnames=("n_iter", "block_b"))
def rhor_mle_pallas(freq, bloch0, w2, n_iter: int = 150, block_b: int = 128):
    """Fused RrhoR MLE: returns the bloch vectors of the iterated estimates.

    Parameters
    ----------
    freq : (B, K) normalized count fractions per flattened weighted-POVM row
    bloch0 : (B, D) full-rank starting bloch vectors
    w2 : (K, D) weighted POVM rows * 2^n (see state_core.estimate_mle_rhor)
    n_iter : fixed iteration count (the XLA path's early-exit tolerance is
        irrelevant here: a converged fixed point is stationary)
    """
    freq = jnp.asarray(freq, jnp.float32)
    bloch0 = jnp.asarray(bloch0, jnp.float32)
    w2 = jnp.asarray(w2, jnp.float32)
    b, k = freq.shape
    d2 = w2.shape[-1]
    if not pallas_supported(d2):
        raise ValueError(f"pallas RrhoR requires 4^n % 128 == 0, got D={d2}")
    d = int(round(math.sqrt(d2)))
    n = int(round(math.log2(d)))

    k_pad = _round_up(k, 128)
    b_pad = _round_up(b, block_b)
    freq_p = jnp.zeros((b_pad, k_pad), jnp.float32).at[:b, :k].set(freq)
    # padded batch rows start from the (full-rank) first real row so the
    # iteration stays finite
    if b_pad != b:
        freq_p = freq_p.at[b:, :k].set(freq[0])
    w2_p = jnp.zeros((k_pad, d2), jnp.float32).at[:k].set(w2)
    bloch0_p = jnp.zeros((b_pad, d2), jnp.float32).at[:b].set(bloch0)
    if b_pad != b:
        bloch0_p = bloch0_p.at[b:].set(bloch0[0])

    ptm = _pauli_transfer_np(n)
    ptm_re = jnp.asarray(ptm.real, jnp.float32)
    ptm_im = jnp.asarray(ptm.imag, jnp.float32)

    grid = (b_pad // block_b,)
    out = pl.pallas_call(
        functools.partial(_rhor_kernel, n_iter=n_iter, d=d),
        out_shape=jax.ShapeDtypeStruct((b_pad, d2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_iter * b_pad * (2 * k_pad * d2 + 4 * d2 * d2 + 8 * d**3),
            bytes_accessed=(b_pad * (k_pad + 2 * d2) + k_pad * d2 + 2 * d2 * d2) * 4,
            transcendentals=0,
        ),
    )(freq_p, bloch0_p, w2_p, ptm_re, ptm_im)
    return out[:b]
