"""Lanczos spectrum of the u-space Hessian of the anchored 4q kraus target.

The queued probe from docs/benchmarks.md (rescaled-chain section): after the
diagonal curvature rescale the 4q anchored kraus-MALA step still collapses
to 1.2e-6 against an ideal-diagonal prediction of ~4e-3, i.e. the residual
curvature anisotropy is NOT diagonal. This measures the eigenvalue spectrum
of the u-space Hessian at the anchor via full-reorthogonalization Lanczos
(one HVP per device call): if the stiff directions are low-rank, a
low-rank + diagonal metric can flatten them exactly; if the stiff tail is
wide, the geometric wall is proven.
"""
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import quantpy_tpu as qt
    from quantpy_tpu.channel import depolarizing

    t0 = time.time()
    np.asarray(jnp.ones(8) * 2)
    log(f"init {time.time()-t0:.1f}s")

    # the receipts config: 4q depolarizing(0.1), 256 inputs x 81 POVMs x
    # 2000 shots (docs/benchmarks.md session 4/5)
    tmg = qt.ProcessTomograph(depolarizing(0.1, 4), key=7)
    tmg.experiment(2_000)
    tmg.point_estimate("lifp")
    log("lifp estimate done")

    # build the EXACT chain target (anchored + mode-seek 500 + 32-probe
    # diagonal rescale) by running setup() with a trivial chain budget
    iv = qt.MHMCProcessInterval(
        tmg, n_points=4, burn_steps=0, thinning=1, step=1e-6,
        parametrization="kraus", proposal="mala", adapt_step=False,
        n_chains=1, key=11, curv_probes=32,
    )
    t0 = time.time()
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        iv.setup()
    log(f"setup (mode-seek + diag rescale + 4-step chain): {time.time()-t0:.1f}s")
    s_u = iv._kraus_uscale
    log(f"u-scale: min {s_u.min():.3e} med {np.median(s_u):.3e} "
        f"max {s_u.max():.3e}")

    tgt = iv.chain.target_logpdf
    zdim = s_u.shape[0]
    gfun = jax.grad(lambda u: -tgt(u))

    @jax.jit
    def hvp(v):
        return jax.jvp(gfun, (jnp.zeros(zdim, jnp.float32),), (v,))[1]

    # warm the compile
    t0 = time.time()
    np.asarray(hvp(jnp.zeros(zdim, jnp.float32)))
    log(f"hvp compile: {time.time()-t0:.1f}s; zdim={zdim}")

    def lanczos(seed, m):
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(zdim)
        v /= np.linalg.norm(v)
        V = np.zeros((m + 1, zdim))
        V[0] = v
        alphas, betas = [], []
        beta = 0.0
        t0 = time.time()
        for j in range(m):
            w = np.asarray(hvp(jnp.asarray(V[j], jnp.float32)), np.float64)
            alpha = float(V[j] @ w)
            w -= alpha * V[j]
            if j > 0:
                w -= beta * V[j - 1]
            # full reorthogonalization (f32 HVPs lose orthogonality fast)
            w -= V[: j + 1].T @ (V[: j + 1] @ w)
            w -= V[: j + 1].T @ (V[: j + 1] @ w)
            beta = float(np.linalg.norm(w))
            alphas.append(alpha)
            betas.append(beta)
            if beta < 1e-10:
                log(f"  lanczos breakdown at step {j}")
                break
            V[j + 1] = w / beta
        m_eff = len(alphas)
        T = np.diag(alphas) + np.diag(betas[: m_eff - 1], 1) \
            + np.diag(betas[: m_eff - 1], -1)
        theta, Y = np.linalg.eigh(T)
        weights = Y[0] ** 2  # SLQ quadrature weights
        # Ritz residuals: |beta_m * Y[-1, i]| bounds the eigenpair error
        resid = abs(betas[m_eff - 1]) * np.abs(Y[-1])
        log(f"  seed {seed}: {m_eff} steps in {time.time()-t0:.1f}s")
        ritz_vecs = V[:m_eff].T @ Y  # (zdim, m_eff)
        return theta, weights, resid, ritz_vecs

    results = []
    for seed in (0, 1):
        theta, wts, resid, _ = lanczos(seed, 100)
        results.append((theta, wts, resid))
        top = theta[::-1][:20]
        log(f"seed {seed} top-20 Ritz values: {np.array2string(top, precision=3)}")
        log(f"seed {seed} top-20 residuals:   "
            f"{np.array2string(resid[::-1][:20], precision=3)}")
        log(f"seed {seed} bottom-5 Ritz: {np.array2string(theta[:5], precision=3)}")
        # SLQ spectral-density mass per decade: est. fraction of the zdim
        # eigenvalues in each decade bin
        edges = 10.0 ** np.arange(-3, 8)
        for lo, hi in zip(edges[:-1], edges[1:]):
            mass = wts[(theta >= lo) & (theta < hi)].sum()
            if mass > 1e-6:
                log(f"  decade [{lo:.0e}, {hi:.0e}): SLQ mass {mass:.4f} "
                    f"~ {mass*zdim:.0f} eigenvalues")
        neg = wts[theta < 0].sum()
        log(f"  SLQ mass at lambda < 0: {neg:.5f} (~{neg*zdim:.0f} dirs)")
    np.savez("/tmp/lanczos_4q.npz",
             theta0=results[0][0], w0=results[0][1],
             theta1=results[1][0], w1=results[1][1])
    log("ALL DONE")


if __name__ == "__main__":
    main()
