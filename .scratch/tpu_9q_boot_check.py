"""Post-fix 9q bootstrap check: the eager per-chunk dispatch (round 5)
replaces the round-4 streamed super-chunks at EVERY n where chunking
engages; 9q (chunk=3 at proj-set) was measured 4.7 rec/s in round 3 —
confirm the fixed path holds that."""
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
    from quantpy_tpu.tomography import kron_core

    t0 = time.time()
    np.asarray(jnp.ones(8) * 2)
    log(f"init {time.time()-t0:.1f}s")

    povm1 = jnp.asarray(_single_qubit_preset("proj-set"), jnp.float32)
    b9 = jnp.asarray(qt.GHZ(9).bloch, jnp.float32)
    c9 = kron_core.kron_simulate(jax.random.key(9), povm1, b9, 10_000.0)
    r9 = kron_core.kron_estimate_lin(c9, povm1, 9)
    np.asarray(jnp.sum(r9))
    log("setup done")

    def run9(key, n):
        return kron_core.kron_bootstrap_distances(
            key, r9, povm1, 9, 10_000.0,
            n_points=n, method="mle", dst="hs", max_iter=60,
        )

    t0 = time.time()
    d = np.asarray(run9(jax.random.key(90), 15))
    log(f"9q boot 15 (chunk 3 -> 5 eager calls): compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    d = np.asarray(run9(jax.random.key(91), 15))
    dt = time.time() - t0
    log(f"9Q-BOOT eager: 15 in {dt:.1f}s = {15/dt:.2f} rec/s d50={np.median(d):.4f}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
