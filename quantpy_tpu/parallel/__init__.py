"""Multi-chip scaling over jax.sharding meshes."""

from .mesh import (
    make_mesh,
    povm_sharded_probabilities,
    sharded_bootstrap_distances,
    sharded_coverage,
    sharded_kron_bootstrap_distances,
    sharded_mhmc_process_chains,
    sharded_mhmc_state_chains,
    sharded_process_bootstrap_distances,
)

__all__ = [
    "make_mesh",
    "povm_sharded_probabilities",
    "sharded_bootstrap_distances",
    "sharded_coverage",
    "sharded_kron_bootstrap_distances",
    "sharded_mhmc_process_chains",
    "sharded_mhmc_state_chains",
    "sharded_process_bootstrap_distances",
]
