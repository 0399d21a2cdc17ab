"""Colorimetry: spectrum -> CIE XYZ -> xyY / sRGB.

Counterpart of the reference's `colorimetry/core.py:95-251` (CIE 15:2004).
Standard CIE observer/illuminant tables ship as public data
(`data/cie_data.json`); the integration is vectorized jnp so transmission
spectra straight out of the thin-film TMM convert on-device.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

import numpy as np

import jax.numpy as jnp

_DATA = Path(__file__).resolve().parent.parent / "data" / "cie_data.json"


@lru_cache(maxsize=1)
def _tables():
    d = json.load(open(_DATA))
    return {
        "wl": np.asarray(d["wavelengths_nm"]),
        "2deg": np.asarray(d["cie_1931_2deg"]),
        "10deg": np.asarray(d["cie_1964_10deg"]),
        "d65": np.asarray(d["illuminant_d65"]),
    }


def spectrum_to_xyz(wavelengths_nm, values, illuminant=None,
                    observer: str = "2deg"):
    """CIE tristimulus values of a reflectance/transmittance spectrum,
    normalized so a perfect white gives Y = 100."""
    t = _tables()
    std_wl = t["wl"]
    if min(wavelengths_nm) > std_wl[0] or max(wavelengths_nm) < std_wl[-1]:
        raise ValueError(
            f"Input spectrum range ({min(wavelengths_nm):.1f}-"
            f"{max(wavelengths_nm):.1f} nm) does not cover the required "
            f"visible range ({std_wl[0]:.0f}-{std_wl[-1]:.0f} nm)."
        )
    cmf = jnp.asarray(t[observer if observer in ("2deg", "10deg") else "2deg"])
    S = jnp.asarray(t["d65"] if illuminant is None else illuminant)
    r = jnp.interp(jnp.asarray(std_wl), jnp.asarray(wavelengths_nm),
                   jnp.asarray(values))
    d_lambda = std_wl[1] - std_wl[0]
    X = jnp.sum(r * S * cmf[:, 0]) * d_lambda
    Y = jnp.sum(r * S * cmf[:, 1]) * d_lambda
    Z = jnp.sum(r * S * cmf[:, 2]) * d_lambda
    k = 100.0 / (jnp.sum(S * cmf[:, 1]) * d_lambda)
    return X * k, Y * k, Z * k


def xyz_to_xyY(X, Y, Z):
    s = X + Y + Z
    s = jnp.where(s == 0, 1.0, s)
    return X / s, Y / s, Y


_M_SRGB = jnp.asarray([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570],
])


def xyz_to_srgb(X, Y, Z, normalize: bool = True):
    """Linear XYZ (Y in [0, 100]) -> gamma-corrected sRGB in [0, 1]
    (reference `colorimetry/core.py:202-251`)."""
    xyz = jnp.stack([X, Y, Z]) / 100.0
    rgb = _M_SRGB @ xyz
    rgb = jnp.where(
        rgb <= 0.0031308, 12.92 * rgb,
        1.055 * jnp.maximum(rgb, 1e-12) ** (1.0 / 2.4) - 0.055,
    )
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if normalize:
        m = jnp.max(rgb)
        rgb = jnp.where(m > 0, rgb / jnp.maximum(m, 1e-12), rgb)
    return rgb[0], rgb[1], rgb[2]
