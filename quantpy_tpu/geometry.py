"""Compatibility alias for reference quantpy/geometry.py.

The distance functions live in `quantpy_tpu.ops.geometry` (backend
polymorphic: numpy on host objects, XLA under jit); this module mirrors the
reference's import path `quantpy.geometry`.
"""

from .ops.geometry import (  # noqa: F401
    DISTANCES,
    fidelity,
    hs_dst,
    if_dst,
    product,
    resolve_distance,
    trace_dst,
)

__all__ = ["hs_dst", "trace_dst", "if_dst", "product", "fidelity"]
