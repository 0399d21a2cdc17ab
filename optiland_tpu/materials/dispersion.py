"""Refractive-index dispersion models as pure, differentiable functions.

Covers the 9 refractiveindex.info dispersion formulas supported by the
reference (`optiland/materials/material_file.py:65-74,250-430`) plus an
"ideal" constant-index material (`optiland/materials/ideal.py:22`). Each
material is encoded as a static integer formula code plus a coefficient
vector; the formula code is part of a system's static spec, so the trace can
call the right formula directly (no runtime dispatch), while the coefficient
vector lives in the differentiable parameter pytree — e.g. an ideal
material's index is directly optimizable with `jax.grad`.

Wavelengths are in micrometers throughout (reference `wavelength.py` converts
all user units to um).
"""

from __future__ import annotations

import jax.numpy as jnp

# Formula codes. 1-9 match refractiveindex.info numbering.
FORMULA_IDEAL = 0
FORMULA_SELLMEIER = 1
FORMULA_SELLMEIER2 = 2
FORMULA_POLYNOMIAL = 3
FORMULA_RII = 4
FORMULA_CAUCHY = 5
FORMULA_GASES = 6
FORMULA_HERZBERGER = 7
FORMULA_RETRO = 8
FORMULA_EXOTIC = 9
FORMULA_TABULATED = 10
FORMULA_POLYVAL = 11  # n = polyval(coeffs, w), highest power first (Abbe model)

# Padded coefficient-vector width used by SurfaceStack parameter arrays.
MAX_COEFFS = 17


def _sellmeier(c, w, squared: bool):
    w2 = w * w
    n2 = 1.0 + c[0]
    for k in range(1, len(c) - 1, 2):
        d = c[k + 1] ** 2 if squared else c[k + 1]
        n2 = n2 + c[k] * w2 / (w2 - d)
    return jnp.sqrt(n2)


def _polynomial(c, w):
    n2 = c[0]
    for k in range(1, len(c) - 1, 2):
        n2 = n2 + c[k] * w ** c[k + 1]
    return jnp.sqrt(n2)


def _rii4(c, w):
    w2 = w * w
    n2 = c[0]
    if len(c) > 4:
        n2 = n2 + c[1] * w ** c[2] / (w2 - c[3] ** c[4])
    if len(c) > 8:
        n2 = n2 + c[5] * w ** c[6] / (w2 - c[7] ** c[8])
    for k in range(9, len(c) - 1, 2):
        n2 = n2 + c[k] * w ** c[k + 1]
    return jnp.sqrt(n2)


def _cauchy(c, w):
    n = c[0]
    for k in range(1, len(c) - 1, 2):
        n = n + c[k] * w ** c[k + 1]
    return n


def _gases(c, w):
    inv_w2 = 1.0 / (w * w)
    n = 1.0 + c[0]
    for k in range(1, len(c) - 1, 2):
        n = n + c[k] / (c[k + 1] - inv_w2)
    return n


def _herzberger(c, w):
    w2 = w * w
    g = 1.0 / (w2 - 0.028)
    n = c[0] + c[1] * g + c[2] * g * g
    for k in range(3, len(c)):
        n = n + c[k] * w ** (2 * (k - 2))
    return n


def _retro(c, w):
    w2 = w * w
    rhs = c[0] + c[1] * w2 / (w2 - c[2]) + c[3] * w2
    return jnp.sqrt((2.0 * rhs + 1.0) / (1.0 - rhs))


def _exotic(c, w):
    w2 = w * w
    n2 = c[0] + c[1] / (w2 - c[2]) + c[3] * (w - c[4]) / ((w - c[4]) ** 2 + c[5])
    return jnp.sqrt(n2)


def material_index(formula: int, n_coeffs: int, coeffs, w):
    """Refractive index n(w) for a material.

    Args:
        formula: static formula code (FORMULA_*).
        n_coeffs: static number of valid entries in `coeffs`.
        coeffs: coefficient vector (padded arrays are fine; only the first
            `n_coeffs` entries are read).
        w: wavelength(s) in micrometers.
    """
    w = jnp.asarray(w)
    if formula == FORMULA_TABULATED:
        # coeffs = (wavelengths..., n values...) — edge-clamped linear
        # interpolation matching the reference (`material_file.py:440`,
        # be.interp == np.interp semantics).
        K = n_coeffs // 2
        wl = jnp.asarray(coeffs)[:K]
        nv = jnp.asarray(coeffs)[K:n_coeffs]
        return jnp.interp(w, wl, nv)
    c = [coeffs[i] for i in range(n_coeffs)]
    if formula == FORMULA_IDEAL:
        return jnp.broadcast_to(c[0], w.shape) if w.ndim else c[0] + 0.0 * w
    if formula == FORMULA_SELLMEIER:
        return _sellmeier(c, w, squared=True)
    if formula == FORMULA_SELLMEIER2:
        return _sellmeier(c, w, squared=False)
    if formula == FORMULA_POLYNOMIAL:
        return _polynomial(c, w)
    if formula == FORMULA_RII:
        return _rii4(c, w)
    if formula == FORMULA_CAUCHY:
        return _cauchy(c, w)
    if formula == FORMULA_GASES:
        return _gases(c, w)
    if formula == FORMULA_HERZBERGER:
        return _herzberger(c, w)
    if formula == FORMULA_RETRO:
        return _retro(c, w)
    if formula == FORMULA_EXOTIC:
        return _exotic(c, w)
    if formula == FORMULA_POLYVAL:
        # Horner evaluation, highest-degree coefficient first (the Abbe
        # polynomial model, reference `materials/abbe.py:38-82`)
        n = c[0] + 0.0 * w
        for k in range(1, n_coeffs):
            n = n * w + c[k]
        return n
    raise ValueError(f"Unknown dispersion formula code {formula}")


def material_extinction(formula: int, n_coeffs: int, coeffs, w):
    """Extinction coefficient k(w). Ideal materials store k in coeffs[1];
    dispersion-formula materials are lossless unless tabulated k is attached
    (tabulated n/k arrives with the thin-film subsystem)."""
    w = jnp.asarray(w)
    if formula == FORMULA_IDEAL and n_coeffs > 1:
        return coeffs[1] + 0.0 * w
    return jnp.zeros_like(w)
