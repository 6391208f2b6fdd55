"""12-qubit operator-sharded tomography on the 8-device virtual CPU mesh.

VERDICT r4 #3: the single-chip wall at 12 qubits is proven (the 6^12
counts tensor alone is 8.7 GB f32, and the fused chain's padded
intermediates push far past 16 GB HBM); the designed route is the
operator-sharded kron path — each of 8 devices holds 1/8 of every
6^n-sized tensor (1.1 GB/device), blochs and (4^n,) right-hand sides
ride the mesh. This driver runs the full simulate -> lin -> RrhoR MLE
pipeline at n=12 on the virtual mesh and records wall times + hs-to-truth.

Run with:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python .scratch/mesh_12q.py
(single-core host: the virtual devices time-share one core, so walls are
capability receipts, not perf numbers — the perf story is the per-device
memory bound and the collective schedule.)
"""
import os
import sys
import time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import quantpy_tpu as qt
    from quantpy_tpu.measurements import _single_qubit_preset
    from quantpy_tpu.parallel import (
        make_mesh,
        sharded_kron_estimate_lin,
        sharded_kron_estimate_mle_rhor,
        sharded_kron_simulate,
    )
    from quantpy_tpu.tomography.bootstrap_core import _distance_batch

    assert len(jax.devices()) == 8, jax.devices()
    n = 12
    mesh = make_mesh(8)
    povm1 = jnp.asarray(_single_qubit_preset("proj-set"), jnp.float32)
    t0 = time.time()
    truth = jnp.asarray(qt.GHZ(n).bloch, jnp.float32)
    log(f"truth bloch built ({4**n} components): {time.time()-t0:.1f}s")

    t0 = time.time()
    counts = sharded_kron_simulate(mesh, jax.random.key(12), povm1, truth, 10_000.0)
    tot = float(jnp.sum(counts))
    log(f"sharded simulate: {time.time()-t0:.1f}s, shape {counts.shape}, "
        f"{tot:.3e} shots drawn, sharding {counts.sharding}")

    t0 = time.time()
    lin = sharded_kron_estimate_lin(mesh, counts, povm1, n)
    d_lin = float(np.asarray(_distance_batch("hs", lin, truth, n)))
    log(f"sharded lin: {time.time()-t0:.1f}s, hs-to-truth {d_lin:.4f}")

    t0 = time.time()
    mle = sharded_kron_estimate_mle_rhor(
        mesh, counts, povm1, n, init_bloch=lin, max_iter=60
    )
    d_mle = float(np.asarray(_distance_batch("hs", mle, truth, n)))
    log(f"sharded MLE-60: {time.time()-t0:.1f}s, hs-to-truth {d_mle:.4f}")
    log("ALL DONE")


if __name__ == "__main__":
    main()
