"""Unit + reference-parity tests for the L1 ops layer."""

import numpy as np
import pytest
import scipy.linalg as sla

from quantpy_tpu.ops import (
    bloch_to_matrix,
    fidelity,
    generate_pauli,
    hs_dst,
    if_dst,
    left_inverse,
    lstsq_solve,
    matrix_to_bloch,
    matrix_to_real_tril_vec,
    pauli_transfer_matrix,
    product,
    ptrace,
    real_tril_vec_to_matrix,
    trace_dst,
    unvec,
    vec,
)

from .reference_shim import get_reference

ref = get_reference()
needs_ref = pytest.mark.skipif(ref is None, reason="reference unavailable")


def random_density(rng, n_qubits, batch=()):
    d = 2**n_qubits
    a = rng.normal(size=batch + (d, d)) + 1j * rng.normal(size=batch + (d, d))
    rho = a @ np.swapaxes(a.conj(), -1, -2)
    tr = np.trace(rho, axis1=-2, axis2=-1)
    return rho / tr[..., None, None]


def random_hermitian(rng, d, batch=()):
    a = rng.normal(size=batch + (d, d)) + 1j * rng.normal(size=batch + (d, d))
    return (a + np.swapaxes(a.conj(), -1, -2)) / 2


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6, 7])
def test_bloch_matrix_roundtrip(rng, n):
    rho = random_density(rng, n)
    b = matrix_to_bloch(rho)
    rho2 = bloch_to_matrix(b, n)
    np.testing.assert_allclose(np.asarray(rho2), rho, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_bloch_matrix_batched(rng, n):
    rho = random_density(rng, n, batch=(5, 2))
    b = matrix_to_bloch(rho)
    assert b.shape == (5, 2, 4**n)
    rho2 = bloch_to_matrix(b, n)
    np.testing.assert_allclose(np.asarray(rho2), rho, atol=1e-12)


@needs_ref
@pytest.mark.parametrize("n", [1, 2, 3])
def test_bloch_parity_with_reference(rng, n):
    rho = random_density(rng, n)
    ours = np.asarray(matrix_to_bloch(rho))
    theirs = ref.Qobj(rho).bloch
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    # and back
    ours_m = np.asarray(bloch_to_matrix(theirs, n))
    theirs_m = ref.Qobj(theirs).matrix
    np.testing.assert_allclose(ours_m, theirs_m, atol=1e-12)


@needs_ref
@pytest.mark.parametrize("n", [1, 2])
def test_generate_pauli_parity(n):
    ours = np.asarray(generate_pauli(n))
    theirs = np.asarray(ref.generate_pauli(n))
    np.testing.assert_allclose(ours, theirs)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_pauli_transfer_matrix(rng, n):
    rho = random_density(rng, n)
    b = np.asarray(matrix_to_bloch(rho))
    v = np.asarray(pauli_transfer_matrix(n)) @ b
    np.testing.assert_allclose(np.asarray(unvec(v)), rho, atol=1e-12)


def test_vec_unvec_column_stacking(rng):
    m = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    v = np.asarray(vec(m))
    # column stacking: first column first
    np.testing.assert_allclose(v[:3], m[:, 0])
    np.testing.assert_allclose(np.asarray(unvec(v)), m)


@needs_ref
def test_vec_parity(rng):
    from quantpy.routines import _mat2vec, _vec2mat

    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    np.testing.assert_allclose(np.asarray(vec(m)), _mat2vec(m))
    v = rng.normal(size=16) + 1j * rng.normal(size=16)
    np.testing.assert_allclose(np.asarray(unvec(v)), _vec2mat(v))


@pytest.mark.parametrize("keep", [(0,), (1,), (0, 1), (1, 2), (0, 2)])
def test_ptrace(rng, keep):
    n = 3
    rho = random_density(rng, n)
    ours = np.asarray(ptrace(rho, keep, n))
    if ref is not None:
        theirs = ref.Qobj(rho).ptrace(keep).matrix
        np.testing.assert_allclose(ours, theirs, atol=1e-12)
    assert abs(np.trace(ours) - 1) < 1e-10


def test_ptrace_batched(rng):
    rho = random_density(rng, 2, batch=(4,))
    out = np.asarray(ptrace(rho, (0,), 2))
    assert out.shape == (4, 2, 2)
    for i in range(4):
        np.testing.assert_allclose(
            out[i], np.asarray(ptrace(rho[i], (0,), 2)), atol=1e-12
        )


def test_ptrace_product_state(rng):
    rho_a = random_density(rng, 1)
    rho_b = random_density(rng, 1)
    rho = np.kron(rho_a, rho_b)
    np.testing.assert_allclose(np.asarray(ptrace(rho, (0,), 2)), rho_a, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ptrace(rho, (1,), 2)), rho_b, atol=1e-12)


def test_distances(rng):
    a = random_density(rng, 2)
    b = random_density(rng, 2)
    # hs vs direct formula
    d = np.sqrt(abs(np.trace((a - b) @ (a - b)))) / np.sqrt(2)
    np.testing.assert_allclose(float(hs_dst(a, b)), d, atol=1e-12)
    # trace vs scipy sqrtm formula
    d = abs(np.trace(sla.sqrtm((a - b) @ (a - b)))) / 2
    np.testing.assert_allclose(float(trace_dst(a, b)), d, atol=1e-10)
    # infidelity vs scipy
    d = 1 - np.abs(np.trace(sla.sqrtm(sla.sqrtm(a) @ b @ sla.sqrtm(a))) ** 2)
    np.testing.assert_allclose(float(if_dst(a, b)), d, atol=1e-10)
    # product
    np.testing.assert_allclose(
        complex(product(a, b)), np.trace(a @ b.conj().T), atol=1e-12
    )
    # identical objects snap to zero
    assert float(hs_dst(a, a)) == 0.0
    assert float(if_dst(a, a)) == 0.0


def test_distances_batched(rng):
    a = random_density(rng, 2, batch=(6,))
    b = random_density(rng, 2, batch=(6,))
    dh = np.asarray(hs_dst(a, b))
    dt = np.asarray(trace_dst(a, b))
    di = np.asarray(if_dst(a, b))
    assert dh.shape == dt.shape == di.shape == (6,)
    for i in range(6):
        assert abs(dh[i] - float(hs_dst(a[i], b[i]))) < 1e-12
    # fidelity of identical states is 1
    np.testing.assert_allclose(np.asarray(fidelity(a, a)), 1.0, atol=1e-9)


@needs_ref
def test_cholesky_param_parity(rng):
    from quantpy.routines import _matrix_to_real_tril_vec, _real_tril_vec_to_matrix

    rho = random_density(rng, 2) + 0.1 * np.eye(4)  # strictly PD
    rho /= np.trace(rho)
    ours = np.asarray(matrix_to_real_tril_vec(rho))
    theirs = _matrix_to_real_tril_vec(rho)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    # roundtrip through reference decode
    np.testing.assert_allclose(
        np.asarray(real_tril_vec_to_matrix(theirs)),
        _real_tril_vec_to_matrix(theirs),
        atol=1e-12,
    )


def test_cholesky_roundtrip_batched(rng):
    rho = random_density(rng, 2, batch=(7,)) + 0.05 * np.eye(4)
    tr = np.trace(rho, axis1=-2, axis2=-1)
    rho = rho / tr[..., None, None]
    v = matrix_to_real_tril_vec(rho)
    assert v.shape == (7, 16)
    rho2 = np.asarray(real_tril_vec_to_matrix(v))
    np.testing.assert_allclose(rho2, rho, atol=1e-10)


@needs_ref
def test_left_inverse_parity(rng):
    from quantpy.routines import _left_inv

    a = rng.normal(size=(24, 16))
    np.testing.assert_allclose(np.asarray(left_inverse(a)), _left_inv(a), atol=1e-9)


def test_lstsq_solve(rng):
    a = rng.normal(size=(24, 16))
    x_true = rng.normal(size=16)
    b = a @ x_true
    x = np.asarray(lstsq_solve(a, b))
    np.testing.assert_allclose(x, x_true, atol=1e-9)


def test_cplx_pair_roundtrip(rng):
    from quantpy_tpu.ops import from_pair, to_pair

    z = rng.normal(size=(3, 4)) + 1j * rng.normal(size=(3, 4))
    pair = to_pair(z)
    assert pair.shape == (3, 4, 2)
    np.testing.assert_allclose(from_pair(pair), z, atol=1e-7)


def test_pair_complex_in_jit(rng):
    import jax
    import jax.numpy as jnp

    from quantpy_tpu.ops import complex_to_pair, pair_to_complex, to_pair

    z = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))

    @jax.jit
    def f(p):
        w = pair_to_complex(p)
        return complex_to_pair(w @ w.conj().T)

    out = np.asarray(f(to_pair(z)))
    expected = z @ z.conj().T
    np.testing.assert_allclose(out[..., 0] + 1j * out[..., 1], expected, atol=1e-5)


def test_kron_all_and_ptm_cap(rng):
    import pytest as _pytest

    from quantpy_tpu.ops import kron_all, pauli_transfer_matrix

    a = rng.normal(size=(2, 2))
    b = rng.normal(size=(3, 3))
    np.testing.assert_allclose(np.asarray(kron_all([a, b])), np.kron(a, b), atol=1e-12)
    with _pytest.raises(ValueError):
        pauli_transfer_matrix(9)


def test_multinomial_bitrev_split_matches_natural(rng):
    """The pad-free bit-reversed splitter (engaged above
    _BITREV_SPLIT_VOLUME — the 10-qubit bootstrap OOM fix) draws the same
    distribution as the natural-order splitter: exact totals, support,
    and mean agreement over repeated draws."""
    import jax

    from quantpy_tpu.ops import sampling

    probs = rng.dirichlet(np.ones(12), size=(5, 7)).astype(np.float32)
    key = jax.random.key(0)
    nat = np.asarray(sampling.sample_multinomial(key, 1000.0, probs))
    old = sampling._BITREV_SPLIT_VOLUME
    try:
        sampling._BITREV_SPLIT_VOLUME = 0  # force the bit-reversed path
        rev = np.asarray(sampling.sample_multinomial(key, 1000.0, probs))
        keys = jax.random.split(jax.random.key(1), 300)
        draws = np.asarray(
            jax.vmap(
                lambda k: sampling.sample_multinomial(k, 1000.0, probs[0, 0])
            )(keys)
        )
    finally:
        sampling._BITREV_SPLIT_VOLUME = old
    assert nat.shape == rev.shape == (5, 7, 12)
    assert np.all(nat.sum(-1) == 1000) and np.all(rev.sum(-1) == 1000)
    assert np.all(rev >= 0)
    emp = draws.mean(0) / 1000.0
    assert np.abs(emp - probs[0, 0]).max() < 0.01
    # zero-probability outcomes never receive counts on either path
    pz = np.zeros(8, np.float32)
    pz[[1, 6]] = 0.5
    try:
        sampling._BITREV_SPLIT_VOLUME = 0
        zc = np.asarray(sampling.sample_multinomial(jax.random.key(2), 50.0, pz))
    finally:
        sampling._BITREV_SPLIT_VOLUME = old
    assert zc.sum() == 50 and zc[[0, 2, 3, 4, 5, 7]].sum() == 0
