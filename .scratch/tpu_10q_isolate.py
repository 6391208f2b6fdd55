"""Isolate the 10q streamed-bootstrap regression (0.8 -> 0.10 rec/s).

Suspects: (a) the bit-reversed splitter now engages at 10q B=1 (volume
60.5M > the round-4 3<<24 threshold; round 3's 0.8 rec/s ran natural
order), (b) the lax.map streaming wrapper itself.

Matrix (each config in its own jit cache):
  1. fused B=1, bitrev (current threshold)  x4 eager calls
  2. fused B=1, natural order (threshold raised past 60.5M) x4
  3. streamed lax.map 8x1, natural order    one call
Stage-level: simulate-only timing for configs 1-2.
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

    def fused_calls(tag, n_calls):
        f = lambda k: kron_core._kron_bootstrap_fused(  # noqa: E731
            k, r10, povm1, 10, 10_000.0, 1, "mle", "hs", 60, True, "lin")
        np.asarray(f(jax.random.key(0)))  # compile
        t0 = time.time()
        ds = [np.asarray(f(jax.random.key(1 + i))) for i in range(n_calls)]
        dt = time.time() - t0
        log(f"{tag}: {n_calls} fused B=1 calls in {dt:.1f}s = "
            f"{n_calls/dt:.2f} rec/s (d: {np.concatenate(ds).round(4)})")

    def sim_only(tag):
        f = jax.jit(lambda k: kron_core.kron_simulate(
            k, povm1, jnp.broadcast_to(r10, (1,) + r10.shape), 10_000.0))
        np.asarray(jnp.sum(f(jax.random.key(0))))
        t0 = time.time()
        np.asarray(jnp.sum(f(jax.random.key(1))))
        log(f"{tag}: batched simulate B=1 {time.time()-t0:.2f}s")

    # config 1: current threshold (bitrev at 10q B=1)
    sim_only("bitrev")
    fused_calls("bitrev", 4)

    # config 2: natural order
    sampling._BITREV_SPLIT_VOLUME = 1 << 27  # 134M > 60.5M
    jax.clear_caches()
    try:
        sim_only("natural")
        fused_calls("natural", 4)

        # config 3: streamed lax.map 8x1, natural order
        t0 = time.time()
        d = np.asarray(kron_core.kron_bootstrap_distances(
            jax.random.key(50), r10, povm1, 10, 10_000.0,
            n_points=8, method="mle", dst="hs", max_iter=60))
        log(f"natural streamed 8x1: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        d = np.asarray(kron_core.kron_bootstrap_distances(
            jax.random.key(51), r10, povm1, 10, 10_000.0,
            n_points=8, method="mle", dst="hs", max_iter=60))
        dt = time.time() - t0
        log(f"natural streamed 8x1: 8 in {dt:.1f}s = {8/dt:.2f} rec/s "
            f"d50={np.median(d):.4f}")
    finally:
        sampling._BITREV_SPLIT_VOLUME = 3 << 24
    log("ALL DONE")


if __name__ == "__main__":
    main()
