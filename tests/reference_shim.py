"""Import the reference quantpy (read-only, /root/reference) for parity tests.

The reference depends on cvxopt, which is not installed here; its interval
module only needs cvxopt at LP/SOCP solve time, so a minimal stub suffices
for importing. Tests that need actual cvxopt solves are skipped and replaced
by closed-form/scipy cross-checks instead.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_cvxopt_stub():
    if "cvxopt" in sys.modules:
        return
    stub = types.ModuleType("cvxopt")

    def _matrix(*args, **kwargs):  # pragma: no cover - never solved in tests
        raise RuntimeError("cvxopt stub: solver not available in test env")

    solvers = types.SimpleNamespace(
        options={}, lp=_matrix, socp=_matrix, qp=_matrix
    )
    stub.matrix = _matrix
    stub.solvers = solvers
    sys.modules["cvxopt"] = stub


def get_reference():
    """Return the imported reference quantpy package, or None if unavailable."""
    import os

    if not os.path.isdir(REFERENCE_PATH):
        return None
    _install_cvxopt_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import quantpy  # noqa: F401

        return quantpy
    except Exception:
        return None
