"""Stage profile of the 4q process bootstrap (VERDICT r4 #5).

The 69-71 rec/s pipeline, split into its four device stages on the bench
config (depolarizing(0.1, 4), 256 inputs x 81 POVMs x 2000 shots, 256
resamples): simulate / raw factored lifp / NS-Dykstra CPTP projection /
Choi distance. Each stage is timed at steady state (second call, jit
cache warm), synced by a small-sum device->host transfer
(docs/tpu_constraints.md: block_until_ready no-ops through the tunnel).
Also re-examines the projection-cap headroom (VERDICT r4 #5: caps 25/50
quantile agreement was never re-measured after the anchored work).
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
    log(f"init {time.time()-t0:.1f}s; devices {jax.devices()}")

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
    log("setup done")

    def sync(x):
        np.asarray(jnp.sum(x))

    # --- stage 1: simulate ---
    sim = lambda k: process_core.simulate_process_experiment(  # noqa: E731
        k, povm, ob, n_meas)
    sync(sim(jax.random.key(0)))
    t0 = time.time()
    counts = sim(jax.random.key(1))
    sync(counts)
    t_sim = time.time() - t0
    log(f"stage simulate: {t_sim:.3f}s")

    # --- stage 2: raw factored lifp ---
    raw_f = lambda c: process_core.estimate_lifp_factored(  # noqa: E731
        c, in_t, povm, n_meas, cptp=False)
    sync(raw_f(counts))
    t0 = time.time()
    raw = raw_f(counts)
    sync(raw)
    t_lifp = time.time() - t0
    log(f"stage raw lifp: {t_lifp:.3f}s")

    # --- stage 3: NS-Dykstra CPTP projection (host-chunked), cap 50 ---
    def project(x, cap):
        return process_core.cptp_project_bloch_host(
            x, max_iter=cap, chunk=int(np.clip(12800.0 / n_points, 1, 100)),
            cp="ns",
        )

    sync(project(raw, 50))
    t0 = time.time()
    proj50 = project(raw, 50)
    sync(proj50)
    t_proj = time.time() - t0
    log(f"stage NS-Dykstra cap-50: {t_proj:.3f}s")

    # --- stage 4: distance ---
    dist = lambda x: _distance_batch("hs", x, choi_ref, 8)  # noqa: E731
    sync(dist(proj50))
    t0 = time.time()
    d50v = dist(proj50)
    sync(d50v)
    t_dst = time.time() - t0
    d = np.asarray(d50v)
    total = t_sim + t_lifp + t_proj + t_dst
    log(f"stage distance: {t_dst:.3f}s")
    log(f"TOTAL {total:.3f}s = {n_points/total:.1f} rec/s | shares: "
        f"sim {100*t_sim/total:.0f}% lifp {100*t_lifp/total:.0f}% "
        f"proj {100*t_proj/total:.0f}% dst {100*t_dst/total:.0f}%")
    log(f"cap-50 quantiles: d50={np.median(d):.4f} d90={np.quantile(d,0.9):.4f}")

    # --- projection-cap headroom: 25 and 37 vs 50 ---
    for cap in (37, 25):
        sync(project(raw, cap))
        t0 = time.time()
        p = project(raw, cap)
        sync(p)
        dt = time.time() - t0
        dc = np.asarray(dist(p))
        log(f"cap-{cap}: {dt:.3f}s, d50={np.median(dc):.4f} "
            f"d90={np.quantile(dc,0.9):.4f} "
            f"(shift d50 {100*(np.median(dc)/np.median(d)-1):+.2f}%)")
    log("ALL DONE")


if __name__ == "__main__":
    main()
