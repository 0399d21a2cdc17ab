"""Global numeric policy for optiland_tpu.

The reference (optiland) carries a mutable global backend singleton with
device/precision/grad state (`optiland/backend/__init__.py:97-120`,
`torch_backend.py:31-105`). Here the only global is a *dtype policy*:
everything else (grad, vmap, device placement, sharding) is handled by JAX
transforms, which need no state.

Precision:
  - "float64": parity mode. Matches the reference numpy backend defaults and
    is used by the test-suite to validate against the mounted reference.
  - "float32": TPU performance mode (default compute dtype of the benchmark).
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float64": jnp.float64,
    "float32": jnp.float32,
}

_dtype = jnp.float64


def set_precision(precision: str) -> None:
    """Set the default floating dtype used when building system parameters."""
    global _dtype
    try:
        _dtype = _DTYPES[precision]
    except KeyError:
        raise ValueError(
            f"Unknown precision {precision!r}; expected one of {sorted(_DTYPES)}"
        ) from None


def get_dtype():
    """Return the current default floating dtype."""
    return _dtype


# Platforms with native complex128 support. TPUs have none (XLA: "Element
# type C128 is not supported on TPU"), so every complex-forming site in the
# wave-optics paths (FFT/MMDFT/Huygens PSF, sampled MTF, Jones/PRT,
# thin-film TMM) must drop to complex64 there even in float64 parity mode.
_C128_PLATFORMS = {"cpu", "cuda", "gpu", "rocm"}


def complex_dtype():
    """The complex dtype matching the precision policy AND the default
    backend's capabilities: complex128 only in float64 mode on a platform
    that supports it, else complex64."""
    if _dtype != jnp.float64:
        return jnp.complex64
    import jax

    try:
        platform = jax.default_backend()
    except Exception:  # backend init failure: assume the conservative case
        platform = "unknown"
    return (jnp.complex128 if platform in _C128_PLATFORMS
            else jnp.complex64)


def imag_unit(dtype=None):
    """1j as a policy-dtype array. Use this instead of the Python literal
    in any expression that can run EAGERLY: `1j * f32_array` materializes a
    complex128 scalar on the device first, which TPUs reject even when the
    promoted result would be complex64 (inside jit the constant folds, so
    only eager sites crash — an easy trap)."""
    import numpy as np

    return jnp.asarray(np.complex64(1j) if
                       (dtype or complex_dtype()) == jnp.complex64
                       else np.complex128(1j))


def phase_dtype():
    """The real dtype to compute phases in before `exp(1j*phase)` so the
    resulting complex arrays match `complex_dtype()` (complex promotion in
    JAX follows the real operand's width)."""
    return (jnp.float64 if complex_dtype() == jnp.complex128
            else jnp.float32)
