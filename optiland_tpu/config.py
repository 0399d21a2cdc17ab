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
