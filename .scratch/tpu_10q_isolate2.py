"""10q bootstrap isolation, part 2 (part 1 died to a remote-compile flake
after refuting suspect (a): eager fused B=1 WITH bitrev = 1.03 rec/s,
better than round 3's 0.8 natural-order — the bit-reversed splitter is
not the regression).

Remaining matrix, ordered by value:
  1. streamed lax.map 16x1, current thresholds (bitrev) — the EXACT
     default path of kron_bootstrap_distances(n_points=16) at 10q, i.e.
     what round 4 measured at 0.10 rec/s. If slow, the lax.map wrapper
     is the culprit.
  2. eager per-chunk loop (no lax.map), bitrev — the candidate fix.
  3. natural-order fused B=1 x4 (threshold raised) — threshold
     re-justification.
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
    from quantpy_tpu.measurements import _single_qubit_preset
    from quantpy_tpu.ops import sampling
    from quantpy_tpu.tomography import kron_core

    t0 = time.time()
    np.asarray(jnp.ones(8) * 2)
    log(f"init {time.time()-t0:.1f}s")

    povm1 = jnp.asarray(_single_qubit_preset("proj-set"), jnp.float32)
    b10 = jnp.asarray(qt.GHZ(10).bloch, jnp.float32)
    c10 = kron_core.kron_simulate(jax.random.key(10), povm1, b10, 10_000.0)
    r10 = kron_core.kron_estimate_lin(c10, povm1, 10)
    np.asarray(jnp.sum(r10))
    log("setup done")

    # --- 1. the default streamed path (lax.map 16x1, bitrev) ---
    def run10(key, n):
        return kron_core.kron_bootstrap_distances(
            key, r10, povm1, 10, 10_000.0,
            n_points=n, method="mle", dst="hs", max_iter=60,
        )

    t0 = time.time()
    d = np.asarray(run10(jax.random.key(100), 16))
    log(f"streamed 16x1 bitrev: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    d = np.asarray(run10(jax.random.key(101), 16))
    dt = time.time() - t0
    log(f"STREAMED 16x1 bitrev: 16 in {dt:.1f}s = {16/dt:.2f} rec/s "
        f"d50={np.median(d):.4f}")

    # --- 2. eager per-chunk loop, bitrev (candidate fix) ---
    f = lambda k: kron_core._kron_bootstrap_fused(  # noqa: E731
        k, r10, povm1, 10, 10_000.0, 1, "mle", "hs", 60, True, "lin")
    np.asarray(f(jax.random.key(0)))
    t0 = time.time()
    ds = [np.asarray(f(jax.random.key(1 + i))) for i in range(8)]
    dt = time.time() - t0
    log(f"EAGER per-call bitrev: 8 fused B=1 calls in {dt:.1f}s = "
        f"{8/dt:.2f} rec/s (d50={np.median(np.concatenate(ds)):.4f})")

    # --- 3. natural order fused B=1 (threshold re-justification) ---
    sampling._BITREV_SPLIT_VOLUME = 1 << 27
    jax.clear_caches()
    try:
        np.asarray(f(jax.random.key(0)))
        t0 = time.time()
        ds = [np.asarray(f(jax.random.key(1 + i))) for i in range(4)]
        dt = time.time() - t0
        log(f"EAGER per-call natural: 4 fused B=1 calls in {dt:.1f}s = "
            f"{4/dt:.2f} rec/s")
    finally:
        sampling._BITREV_SPLIT_VOLUME = 3 << 24
    log("ALL DONE")


if __name__ == "__main__":
    main()
