"""Multi-chip scaling: mesh construction and sharded bootstrap.

The reference is single-process NumPy with sequential loops (SURVEY.md
section 2, "parallelism: absent"). The TPU-native scaling axis for every
workload in this domain is the *experiment/resample batch*: thousands of
independent simulate+estimate problems. This module shards that axis over a
`jax.sharding.Mesh` with `shard_map`, so the per-device program is exactly
the single-chip bootstrap and the only collective is the final gather of
distances over ICI.

For very large qubit counts the (K, 4^n) weighted-POVM operator can also be
sharded over the measurement axis (`povm_sharded_probabilities`), turning
probability evaluation into a reduce-scattered matmul; with n <= 6 and the
batch axis available this is rarely the right trade, so batch sharding is
the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import rdtype
from ..tomography import bootstrap_core

__all__ = ["make_mesh", "sharded_bootstrap_distances", "povm_sharded_probabilities"]

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D device mesh over the experiment/resample batch axis."""
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def sharded_bootstrap_distances(
    mesh: Mesh,
    key,
    bloch_est,
    povm_matrix,
    n_measurements,
    n_points: int,
    method: str = "lin",
    dst: str = "hs",
    max_iter: int = 100,
):
    """Bootstrap `n_points` resamples data-parallel over the mesh.

    Each device draws and re-estimates its n_points/n_dev shard with an
    independent fold of `key`; distances are returned fully replicated
    (all_gather over ICI).
    """
    n_dev = mesh.devices.size
    if n_points % n_dev:
        raise ValueError(f"n_points={n_points} must divide by {n_dev} devices")
    per_dev = n_points // n_dev
    keys = jax.random.split(key, n_dev)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(), P(), P()),
        out_specs=P(BATCH_AXIS),
        check_vma=False,  # multinomial's internal while_loop carries
        # device-varying state that the VMA checker cannot type
    )
    def run(keys_shard, bloch_est, povm_matrix, n_measurements):
        d = bootstrap_core.bootstrap_distances(
            keys_shard[0],
            bloch_est,
            povm_matrix,
            n_measurements,
            n_points=per_dev,
            method=method,
            dst=dst,
            max_iter=max_iter,
        )
        return d

    return jax.jit(run)(
        keys,
        jnp.asarray(bloch_est, dtype=rdtype()),
        jnp.asarray(povm_matrix, dtype=rdtype()),
        jnp.asarray(n_measurements, dtype=rdtype()),
    )


def povm_sharded_probabilities(mesh: Mesh, povm_flat, bloch):
    """Probability evaluation with the measurement axis sharded over the
    mesh: p_k = (W @ bloch)_k computed on the owner of row k. Demonstrates
    the operator-sharded path for large n (SURVEY.md section 2 checklist).
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(axis)
    )
    def run(w_shard, b):
        return w_shard @ b

    return run(jnp.asarray(povm_flat, rdtype()), jnp.asarray(bloch, rdtype()))
