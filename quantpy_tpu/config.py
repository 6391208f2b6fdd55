"""Precision and device configuration for quantpy-tpu.

TPU-native default is single precision (float32/complex64): the MXU and VPU run
at full rate there and HBM traffic halves. For parity tests against the CPU
reference (which runs in float64/complex128, see reference quantpy/routines.py)
an x64 mode is provided via :func:`enable_x64`.

All numeric modules in this package derive their dtypes from the *current* JAX
x64 flag through :func:`rdtype`/:func:`cdtype`, so flipping the flag switches
the whole framework's precision coherently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "enable_x64",
    "is_x64",
    "rdtype",
    "cdtype",
    "default_device_kind",
    "set_matmul_precision",
]


def set_matmul_precision(precision: str = "highest") -> None:
    """Set the global matmul precision.

    TPU matmuls default to bfloat16 inputs, which destroys tomography
    accuracy: measured on hardware, the 4-qubit bootstrap's distance
    distribution collapses from a median of 0.004 to 0.84 under the
    default. The 4^n-dim operators here are small, so 'highest'
    (f32 via bf16x3 passes on the MXU) costs nothing — it measured
    *faster* than 'bfloat16' on the flagship benchmark. Called with
    'highest' on package import.
    """
    jax.config.update("jax_default_matmul_precision", precision)


def enable_x64(enable: bool = True) -> None:
    """Globally enable/disable 64-bit precision (float64/complex128).

    x64 is a CPU-side mode (reference-parity testing); TPUs have no f64
    hardware and the target backend fails on f64 buffers, so enabling it
    with a TPU default device raises instead of poisoning the process
    (docs/tpu_constraints.md)."""
    if enable:
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "unknown"
        if platform not in ("cpu", "unknown"):
            raise RuntimeError(
                "x64 mode is CPU-only; set jax_platforms='cpu' first "
                f"(default device platform: {platform})"
            )
    jax.config.update("jax_enable_x64", enable)


def is_x64() -> bool:
    """Whether 64-bit mode is currently active."""
    return bool(jax.config.jax_enable_x64)


def rdtype() -> jnp.dtype:
    """Current default real dtype (float32, or float64 in x64 mode)."""
    return jnp.dtype(jnp.float64 if is_x64() else jnp.float32)


def cdtype() -> jnp.dtype:
    """Current default complex dtype (complex64, or complex128 in x64 mode)."""
    return jnp.dtype(jnp.complex128 if is_x64() else jnp.complex64)


def default_device_kind() -> str:
    """Kind of the default JAX device ('tpu', 'cpu', ...)."""
    return jax.devices()[0].platform
