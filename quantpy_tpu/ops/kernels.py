"""Pallas TPU kernels for the hot estimator loops.

`rhor_mle_pallas` fuses the ENTIRE RrhoR maximum-likelihood iteration
(quantpy_tpu.tomography.state_core.estimate_mle_rhor, the flagship
bootstrap workload) into one kernel: probabilities, likelihood ratios, the
R operator, the R rho R sandwich and the renormalization all stay in VMEM
for all `n_iter` iterations. Measured on the v5e target: 69.4 ms vs
79.9 ms for the XLA path (60 iterations x 2048 resamples, results equal to
9e-8); estimate_mle_rhor dispatches to it automatically on TPU when the
shapes qualify (D = 4^n a multiple of 128, i.e. n >= 4, batched input).

Getting this to compile required working around two Mosaic limitations
(minimal repros verified on hardware):

1. Lane-splitting reshapes of matmul results are rejected
   ((Bt, 256) -> (Bt, 16, 16): "infer-vector-layout: unsupported shape
   cast"), and a (Bt, d, d) small-matrix layout pads its 16-lane minor
   dimension 8x in VMEM (measured OOM). The kernel therefore keeps the
   BATCH on the lane axis throughout: density matrices are (d, d, Bt)
   tensors produced by sublane-splitting (D, Bt) matmul results, which
   Mosaic accepts. The column-stacked reshape yields transposed matrices;
   the Hermitian palindrome R rho R is closed under transposition, so
   nothing ever needs untransposing.
2. In that layout the d x d batched matmul is not MXU-expressible, so the
   sandwich runs as d statically-unrolled broadcast multiply-adds on the
   VPU (static slices only; fancy indexing lowers to >2D gathers Mosaic
   rejects).
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


def _rhor_kernel_t(f_t_ref, bloch0_t_ref, w2_ref, w2t_ref, ptm_re_ref,
                   ptm_im_ref, ptm_re_t_ref, ptm_im_t_ref, out_ref,
                   *, n_iter: int, d: int):
    """Lane-batched variant: the batch lives on the LANE axis throughout.

    Mosaic rejects lane-splitting reshapes of matmul results and pads a
    (Bt, d, d) small-matrix layout 8x in VMEM (measured OOM), so density
    matrices are carried as (d, d, Bt) tensors — sublane-split reshape of
    (D, Bt) matmul results, which compiles — and the d x d batched matmul
    sandwich runs as d unrolled broadcast multiply-adds on the VPU
    (d=16: 131 KB per operand, no relayouts, no transposes).
    """
    bt = f_t_ref.shape[-1]
    w2 = w2_ref[:]            # (K_pad, D)
    w2t = w2t_ref[:]          # (D, K_pad)
    ptm_re = ptm_re_ref[:]    # (D, D)
    ptm_im = ptm_im_ref[:]
    ptm_re_t = ptm_re_t_ref[:]
    ptm_im_t = ptm_im_t_ref[:]
    f_t = f_t_ref[:]          # (K_pad, Bt)

    def to_mats_t(vecs_t):
        """(D, Bt) bloch columns -> (d, d, Bt) matrix-pair tensors."""
        re = jnp.dot(ptm_re, vecs_t, preferred_element_type=jnp.float32)
        im = jnp.dot(ptm_im, vecs_t, preferred_element_type=jnp.float32)
        return re.reshape(d, d, bt), im.reshape(d, d, bt)

    def bmm(a, b):
        """Lane-batched (d, d, Bt) matmul: C[i,k,:] = sum_j A[i,j,:]B[j,k,:],
        d statically unrolled broadcast FMAs on the VPU (static slices only;
        fancy indexing lowers to >2D gathers Mosaic rejects)."""
        def term(j):
            aj = jax.lax.slice_in_dim(a, j, j + 1, axis=1)  # (d, 1, Bt)
            bj = jax.lax.slice_in_dim(b, j, j + 1, axis=0)  # (1, d, Bt)
            return aj * bj
        acc = term(0)
        for j in range(1, d):
            acc = acc + term(j)
        return acc

    def cmm(a_re, a_im, b_re, b_im):
        """Complex lane-batched matmul via Karatsuba: 3 real bmms instead
        of 4 (the bmm is the kernel's VPU-bound stage — d broadcast FMAs
        per product vs 5 cheap elementwise combines; measured win in the
        whole-kernel timing). Operands here are O(1) (R, rho are
        normalized), so the extra cancellation is benign — the fixed
        point is self-correcting and the XLA-equality test bounds it."""
        p1 = bmm(a_re, b_re)
        p2 = bmm(a_im, b_im)
        p3 = bmm(a_re + a_im, b_re + b_im)
        return p1 - p2, p3 - p1 - p2

    def body(_, bloch_t):
        probs = jnp.dot(w2, bloch_t, preferred_element_type=jnp.float32)
        c = f_t / jnp.maximum(probs, _EPS)
        r_t = jnp.dot(w2t, c, preferred_element_type=jnp.float32)  # (D, Bt)
        r_re, r_im = to_mats_t(r_t)
        rho_re, rho_im = to_mats_t(bloch_t)
        s_re, s_im = cmm(r_re, r_im, rho_re, rho_im)
        t_re, t_im = cmm(s_re, s_im, r_re, r_im)
        vec_re_t = t_re.reshape(d * d, bt)
        vec_im_t = t_im.reshape(d * d, bt)
        new_t = (
            jnp.dot(ptm_re_t, vec_re_t, preferred_element_type=jnp.float32)
            + jnp.dot(ptm_im_t, vec_im_t, preferred_element_type=jnp.float32)
        ) / d
        return new_t / (d * new_t[0:1, :])

    out_ref[:] = jax.lax.fori_loop(0, n_iter, body, bloch0_t_ref[:])


@functools.partial(jax.jit, static_argnames=("n_iter", "block_b"))
def rhor_mle_pallas(freq, bloch0, w2, n_iter: int = 60, block_b: int = 128):
    """Fused RrhoR MLE on TPU (lane-batched layout; see _rhor_kernel_t).

    freq (B, K) count fractions, bloch0 (B, D) full-rank starting blochs,
    w2 (K, D) weighted POVM rows * 2^n. Returns (B, D) estimate blochs.
    Fixed iteration count (a converged fixed point is stationary, so extra
    iterations are harmless; 60 reaches the f32 floor on the flagship
    config)."""
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
    out_t = pl.pallas_call(
        functools.partial(_rhor_kernel_t, n_iter=n_iter, d=d),
        out_shape=jax.ShapeDtypeStruct((d2, b_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d2, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_iter * b_pad * (2 * k_pad * d2 + 6 * d2 * d2 + 6 * d**3),
            bytes_accessed=(b_pad * (k_pad + 2 * d2) + 2 * k_pad * d2
                            + 4 * d2 * d2) * 4,
            transcendentals=0,
        ),
    )(freq_p.T, bloch0_p.T, w2_p, w2_p.T, ptm_re, ptm_im, ptm_re.T, ptm_im.T)
    return out_t.T[:b]
