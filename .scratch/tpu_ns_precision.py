"""Reduced-precision NS-Dykstra experiment (round 5).

The 4q process bootstrap is 87% NS-Dykstra projection, which is
MXU-matmul-bound at 'highest' (f32-effective) precision. A Dykstra
CLEANUP only needs accuracy at the bootstrap's statistical scale
(~0.5 distance quantiles, round-3 agreement bar 4e-4), so the sign
chain may tolerate cheaper matmul precisions. Measure time + d50/d90
for matmul precision in {highest (baseline), high, default(bf16)} on
the bench config. The precision context is part of jax's jit cache
key, so each variant compiles separately.
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
    from quantpy_tpu.tomography import process_core
    from quantpy_tpu.tomography.bootstrap_core import _distance_batch

    t0 = time.time()
    np.asarray(jnp.ones(8) * 2)
    log(f"init {time.time()-t0:.1f}s")

    n_points = 256
    tmg = qt.ProcessTomograph(depolarizing(0.1, 4), key=7)
    tmg.experiment(2_000)
    est = tmg.point_estimate("lifp")
    t0g = tmg.tomographs[0]
    out_blochs = np.stack(
        [est.transform(s).bloch for s in tmg.input_basis.elements]
    )
    povm = jnp.asarray(t0g.povm_matrix, jnp.float32)
    n_meas = jnp.asarray(t0g.n_measurements, jnp.float32)
    in_t = jnp.asarray(tmg._input_blochs_t(), jnp.float32)
    ob = jnp.broadcast_to(
        jnp.asarray(out_blochs, jnp.float32), (n_points,) + out_blochs.shape
    )
    choi_ref = jnp.asarray(est.choi.bloch, jnp.float32)
    counts = process_core.simulate_process_experiment(
        jax.random.key(1), povm, ob, n_meas)
    raw = process_core.estimate_lifp_factored(
        counts, in_t, povm, n_meas, cptp=False)
    np.asarray(jnp.sum(raw))
    log("setup done")

    def sync(x):
        np.asarray(jnp.sum(x))

    def project(x):
        return process_core.cptp_project_bloch_host(
            x, max_iter=50, chunk=50, cp="ns")

    for prec in ("highest", "high", "default"):
        with jax.default_matmul_precision(prec):
            sync(project(raw))  # compile
            t0 = time.time()
            p = project(raw)
            sync(p)
            dt = time.time() - t0
            d = np.asarray(_distance_batch("hs", p, choi_ref, 8))
        log(f"prec {prec}: cap-50 projection {dt:.3f}s, "
            f"d50={np.median(d):.5f} d90={np.quantile(d, 0.9):.5f} "
            f"finite={bool(np.isfinite(d).all())}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
