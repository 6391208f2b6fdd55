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

__all__ = ["rhor_mle_pallas", "rhor_mle_pallas_flat", "pallas_supported"]

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


def _rhor_kernel_flat(f_t_ref, bloch0_t_ref, g_ref, h_ref, ptm_re_ref,
                      ptm_im_ref, ptm_re_t_ref, ptm_im_t_ref, out_ref,
                      *, n_iter: int, d: int, k_true: int):
    """Flat-matrix variant: the loop state IS the (transposed) density
    matrix pair; probabilities and the R operator come straight from
    flattened-effect matmuls, so the six per-iteration Pauli-transfer
    projections of `_rhor_kernel_t` disappear (PTM matmuls run exactly
    twice: bloch -> matrix at entry, matrix -> bloch at exit).

    g_ref: (K_pad, 2D) stacked [Re Meff | Im Meff] with Meff = ptm @ w2^T/d,
    plus ONE extra row (index `k_true`) holding the diagonal mask — so
    tr(rho) arrives with the same probability matmul for free (f_t is zero
    there, so the mask row never contaminates R). h_ref: (2D, K_pad) =
    d * G^T, giving stacked [Re R ; Im R] flat in one matmul. Probability
    identity: p = Re(Meff^H vec(rho)) == w2 @ bloch for Hermitian
    effects/states (both stored transposed; transposition conjugates both
    factors, leaving the real inner product invariant)."""
    bt = f_t_ref.shape[-1]
    d2 = d * d
    g = g_ref[:]              # (K_pad, 2D)
    h = h_ref[:]              # (2D, K_pad)
    f_t = f_t_ref[:]          # (K_pad, Bt)

    def bmm(a, b):
        def term(j):
            aj = jax.lax.slice_in_dim(a, j, j + 1, axis=1)
            bj = jax.lax.slice_in_dim(b, j, j + 1, axis=0)
            return aj * bj
        acc = term(0)
        for j in range(1, d):
            acc = acc + term(j)
        return acc

    def cmm(a_re, a_im, b_re, b_im):
        p1 = bmm(a_re, b_re)
        p2 = bmm(a_im, b_im)
        p3 = bmm(a_re + a_im, b_re + b_im)
        return p1 - p2, p3 - p1 - p2

    t0_re = jnp.dot(ptm_re_ref[:], bloch0_t_ref[:],
                    preferred_element_type=jnp.float32)
    t0_im = jnp.dot(ptm_im_ref[:], bloch0_t_ref[:],
                    preferred_element_type=jnp.float32)

    def body(_, t_flat):
        t_re, t_im = t_flat
        stacked = jnp.concatenate([t_re, t_im], axis=0)      # (2D, Bt)
        probs = jnp.dot(g, stacked, preferred_element_type=jnp.float32)
        tr = jax.lax.slice_in_dim(probs, k_true, k_true + 1, axis=0)
        c = f_t * tr / jnp.maximum(probs, _EPS)
        r_flat = jnp.dot(h, c, preferred_element_type=jnp.float32)
        r_re = jax.lax.slice_in_dim(r_flat, 0, d2, axis=0).reshape(d, d, bt)
        r_im = jax.lax.slice_in_dim(r_flat, d2, 2 * d2, axis=0).reshape(
            d, d, bt)
        rho_re = t_re.reshape(d, d, bt)
        rho_im = t_im.reshape(d, d, bt)
        s_re, s_im = cmm(r_re, r_im, rho_re, rho_im)
        u_re, u_im = cmm(s_re, s_im, r_re, r_im)
        # renormalize to unit trace each step (the iteration is otherwise
        # only scale-free to first order and would drift in f32 range):
        # d static diagonal slices, no matmul
        acc = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(u_re, 0, 1, axis=0), 0, 1, axis=1)
        for i in range(1, d):
            acc = acc + jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(u_re, i, i + 1, axis=0), i, i + 1,
                axis=1)
        inv = (1.0 / jnp.maximum(acc, _EPS)).reshape(1, bt)
        return u_re.reshape(d2, bt) * inv, u_im.reshape(d2, bt) * inv

    t_re, t_im = jax.lax.fori_loop(0, n_iter, body, (t0_re, t0_im))
    out_ref[:] = (
        jnp.dot(ptm_re_t_ref[:], t_re, preferred_element_type=jnp.float32)
        + jnp.dot(ptm_im_t_ref[:], t_im, preferred_element_type=jnp.float32)
    ) / d


@functools.partial(jax.jit, static_argnames=("n_iter", "block_b"))
def rhor_mle_pallas_flat(freq, bloch0, w2, n_iter: int = 60,
                         block_b: int = 128):
    """Flat-matrix-representation fused RrhoR MLE (see _rhor_kernel_flat).

    Same contract and fixed point as :func:`rhor_mle_pallas`; per
    iteration it runs TWO large MXU matmuls (contraction 2D = 512 at the
    flagship size) instead of eight medium ones — ~20% fewer MXU mults
    ((4 K D) vs (2 K D + 6 D^2) per element) and four fewer reshapes.

    Measured on the v5e flagship config (2026-08-20, 16384-resample
    bootstrap batches, distances equal to the lane kernel within 4.1e-6):
    75,820 rec/s vs the lane kernel's 83,412 — 9% SLOWER despite the
    matmul savings. Verdict for the MFU question (docs/benchmarks.md):
    the kernel is not MXU-bound; the VPU RrhoR sandwich (the 6 unrolled
    d-term broadcast passes per iteration, shared by both variants)
    dominates, and every layout that would make the d x d contraction an
    MXU matmul puts the d=16 extent on the lane axis, which Mosaic pads
    8x (measured VMEM OOM, module docstring #1). estimate_mle_rhor keeps
    dispatching to the lane kernel; this variant stays as the measured
    receipt."""
    freq = jnp.asarray(freq, jnp.float32)
    bloch0 = jnp.asarray(bloch0, jnp.float32)
    w2 = jnp.asarray(w2, jnp.float32)
    b, k = freq.shape
    d2 = w2.shape[-1]
    if not pallas_supported(d2):
        raise ValueError(f"pallas RrhoR requires 4^n % 128 == 0, got D={d2}")
    d = int(round(math.sqrt(d2)))
    n = int(round(math.log2(d)))

    k_pad = _round_up(k + 1, 128)  # one extra row: the trace mask
    b_pad = _round_up(b, block_b)
    freq_p = jnp.zeros((b_pad, k_pad), jnp.float32).at[:b, :k].set(freq)
    if b_pad != b:
        freq_p = freq_p.at[b:, :k].set(freq[0])
    bloch0_p = jnp.zeros((b_pad, d2), jnp.float32).at[:b].set(bloch0)
    if b_pad != b:
        bloch0_p = bloch0_p.at[b:].set(bloch0[0])

    ptm = _pauli_transfer_np(n)  # vec(rho^T) = ptm @ bloch; ptm^H ptm = d I
    ptm_re = jnp.asarray(ptm.real, jnp.float32)
    ptm_im = jnp.asarray(ptm.imag, jnp.float32)
    # Meff = ptm @ w2^T / d (D, K); G rows are [Re Meff^T | Im Meff^T]
    # (w2 may be a tracer — build with jnp; the split is real throughout)
    g_arr = jnp.zeros((k_pad, 2 * d2), jnp.float32)
    g_arr = g_arr.at[:k, :d2].set(w2 @ ptm_re.T / d)
    g_arr = g_arr.at[:k, d2:].set(w2 @ ptm_im.T / d)
    # trace mask row: tr(rho) = sum_i vec(rho)[i*(d+1)] (real part)
    g_arr = g_arr.at[k, np.arange(d) * (d + 1)].set(1.0)
    h_arr = d * g_arr.T

    grid = (b_pad // block_b,)
    out_t = pl.pallas_call(
        functools.partial(_rhor_kernel_flat, n_iter=n_iter, d=d, k_true=k),
        out_shape=jax.ShapeDtypeStruct((d2, b_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_pad, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, block_b), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, 2 * d2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * d2, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d2, block_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=n_iter * b_pad * (8 * k_pad * d2 + 12 * d**3),
            bytes_accessed=(b_pad * (k_pad + 2 * d2) + 4 * k_pad * d2
                            + 4 * d2 * d2) * 4,
            transcendentals=0,
        ),
    )(freq_p.T, bloch0_p.T, g_arr, h_arr, ptm_re, ptm_im, ptm_re.T, ptm_im.T)
    return out_t.T[:b]


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
