"""Re-time the 11q chunked simulate after keeping blocks on device."""
import sys, time
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)
def main():
    import jax, jax.numpy as jnp
    import quantpy_tpu as qt
    from quantpy_tpu.measurements import _single_qubit_preset
    from quantpy_tpu.tomography import kron_core
    t0 = time.time(); np.asarray(jnp.ones(8) * 2); log(f"init {time.time()-t0:.1f}s")
    povm1 = jnp.asarray(_single_qubit_preset("proj-set"), jnp.float32)
    b11 = jnp.asarray(qt.GHZ(11).bloch, jnp.float32)
    t0 = time.time()
    c = kron_core.kron_simulate_chunked(jax.random.key(111), povm1, b11, 10_000.0)
    tot = float(jnp.sum(c))
    log(f"11q chunked draw (device-resident blocks): {time.time()-t0:.1f}s, "
        f"{tot:.4g} shots")
    r = kron_core.kron_estimate_lin(c, povm1, 11)
    np.asarray(jnp.sum(r))
    e = kron_core.kron_estimate_mle_rhor(c, povm1, 11, max_iter=60)
    from quantpy_tpu.tomography.bootstrap_core import _distance_batch
    log(f"hs-to-truth {float(np.asarray(_distance_batch('hs', e, b11, 11))):.4f}")
    log("ALL DONE")
if __name__ == "__main__":
    main()
