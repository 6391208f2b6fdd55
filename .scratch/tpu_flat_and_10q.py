"""Round-4 on-chip measurements: flat-matrix RrhoR kernel + streamed 10q bootstrap.

Order matters (a failed Pallas compile poisons the client): the known-good
lane-batched flagship timing runs FIRST, then the never-compiled flat
kernel, then the 10q streamed bootstrap.
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
    from quantpy_tpu.ops import kernels
    from quantpy_tpu.tomography.bootstrap_core import bootstrap_distances
    from quantpy_tpu.tomography.state import StateTomograph

    # single init attempt: the axon first op HANGS rather than fails on a
    # bad tunnel day, and a failed op poisons the client, so in-process
    # retries cannot succeed (ADVICE r4) — rerun the script in a fresh
    # process under an outer timeout instead
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2)
    log(f"init {time.time()-t0:.1f}s; devices {jax.devices()}")

    state = qt.GHZ(4)
    tmg = StateTomograph(state, key=2026)
    tmg.experiment(10_000, "proj-set")
    est = tmg.point_estimate("mle-rhor")
    bloch = jnp.asarray(est.bloch, jnp.float32)
    povm = jnp.asarray(tmg.povm_matrix, jnp.float32)
    n_meas = jnp.asarray(tmg.n_measurements, jnp.float32)

    def run(key, n):
        return bootstrap_distances(
            key, bloch, povm, n_meas, n_points=n,
            method="mle-rhor", dst="hs", max_iter=60,
        )

    # ---- 1. lane-batched kernel (current dispatch), flagship timing ----
    t0 = time.time()
    ref_small = np.asarray(run(jax.random.key(42), 1024))
    log(f"lane 1024 compile+run {time.time()-t0:.1f}s")
    np.asarray(run(jax.random.key(0), 16384))
    times = []
    for i in range(1, 4):
        t0 = time.time()
        d_lane = np.asarray(run(jax.random.key(i), 16384))
        times.append(time.time() - t0)
    log(f"LANE: times {[f'{t:.3f}' for t in times]} -> "
        f"{16384/min(times):.0f} rec/s; d50={np.median(d_lane):.4f}")

    # ---- 2. flat kernel: compile, correctness vs lane, timing ----
    orig = kernels.rhor_mle_pallas

    def flat(freq, bloch0, w2, n_iter=60, block_b=128):
        return kernels.rhor_mle_pallas_flat(
            freq, bloch0, w2, n_iter=n_iter, block_b=block_b)

    kernels.rhor_mle_pallas = flat
    jax.clear_caches()  # bootstrap program cached with the lane kernel
    try:
        t0 = time.time()
        d_flat_small = np.asarray(run(jax.random.key(42), 1024))
        log(f"flat 1024 compile+run {time.time()-t0:.1f}s; "
            f"max|flat-lane| distance diff = "
            f"{np.max(np.abs(d_flat_small - ref_small)):.2e} "
            f"(d50 {np.median(d_flat_small):.4f} vs {np.median(ref_small):.4f})")
        np.asarray(run(jax.random.key(0), 16384))
        times_f = []
        for i in range(1, 4):
            t0 = time.time()
            d_flat = np.asarray(run(jax.random.key(i), 16384))
            times_f.append(time.time() - t0)
        log(f"FLAT: times {[f'{t:.3f}' for t in times_f]} -> "
            f"{16384/min(times_f):.0f} rec/s; d50={np.median(d_flat):.4f}")
    except Exception as e:
        log(f"FLAT kernel failed on hardware: {e!r}")
        log("client may be poisoned; 10q measurement moved to a fresh run")
        raise SystemExit(2)
    finally:
        kernels.rhor_mle_pallas = orig

    # ---- 3. streamed 10q bootstrap ----
    jax.clear_caches()
    from quantpy_tpu.measurements import _single_qubit_preset
    from quantpy_tpu.tomography import kron_core

    povm1 = jnp.asarray(_single_qubit_preset("proj-set"), jnp.float32)
    b10 = jnp.asarray(qt.GHZ(10).bloch, jnp.float32)
    c10 = kron_core.kron_simulate(jax.random.key(10), povm1, b10, 10_000.0)
    r10 = kron_core.kron_estimate_lin(c10, povm1, 10)
    np.asarray(jnp.sum(r10))
    log("10q setup done")

    def run10(key, n):
        return kron_core.kron_bootstrap_distances(
            key, r10, povm1, 10, 10_000.0,
            n_points=n, method="mle", dst="hs", max_iter=60,
        )

    t0 = time.time()
    d10 = np.asarray(run10(jax.random.key(100), 16))
    log(f"10q boot 16: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    d10 = np.asarray(run10(jax.random.key(101), 16))
    dt = time.time() - t0
    log(f"10Q-BOOT: 16 resamples in {dt:.1f}s = {16/dt:.2f} rec/s; "
        f"d50={np.median(d10):.4f} d90={np.quantile(d10, 0.9):.4f} "
        f"finite={bool(np.isfinite(d10).all())}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
