"""Functional numeric core: pure, jittable, batched array ops."""

from .cholesky import (
    matrix_to_real_tril_vec,
    real_tril_vec_to_matrix,
    tril_param_dim,
)
from .geometry import fidelity, hs_dst, if_dst, product, resolve_distance, trace_dst
from .lstsq import left_inverse, lstsq_solve
from .paulis import (
    PAULI_1,
    bloch_to_matrix,
    generate_pauli,
    kron_all,
    matrix_to_bloch,
    n_qubits_from_dim,
    pauli_transfer_matrix,
    ptrace,
    unvec,
    vec,
)
from .sampling import sample_multinomial

__all__ = [
    "PAULI_1",
    "bloch_to_matrix",
    "fidelity",
    "generate_pauli",
    "hs_dst",
    "if_dst",
    "kron_all",
    "left_inverse",
    "lstsq_solve",
    "matrix_to_bloch",
    "matrix_to_real_tril_vec",
    "n_qubits_from_dim",
    "pauli_transfer_matrix",
    "product",
    "ptrace",
    "real_tril_vec_to_matrix",
    "resolve_distance",
    "sample_multinomial",
    "trace_dst",
    "tril_param_dim",
    "unvec",
    "vec",
]


from .cplx import complex_to_pair, from_pair, pair_to_complex, to_pair  # noqa: E402

__all__ += ["complex_to_pair", "from_pair", "pair_to_complex", "to_pair"]
