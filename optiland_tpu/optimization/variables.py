"""Optimization variables: named views into the SystemParams pytree.

The reference implements variables as behavior classes mutating Optic objects
(`optimization/variable/*.py`). Here a variable is a (get, set) pair on the
immutable params pytree plus a scaler; the optimizer works in scaled space
and `apply_all` rebuilds a params pytree functionally — which is what lets
the whole merit be one jitted value_and_grad.

Scalers mirror `optimization/scaling/`: identity, linear, log, reciprocal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp


class Scaler:
    def scale(self, value):
        raise NotImplementedError

    def inverse_scale(self, value):
        raise NotImplementedError


class IdentityScaler(Scaler):
    def scale(self, value):
        return value

    def inverse_scale(self, value):
        return value


@dataclass
class LinearScaler(Scaler):
    factor: float = 1.0
    offset: float = 0.0

    def scale(self, value):
        return value * self.factor + self.offset

    def inverse_scale(self, value):
        return (value - self.offset) / self.factor


class LogScaler(Scaler):
    def scale(self, value):
        return jnp.log(value)

    def inverse_scale(self, value):
        return jnp.exp(value)


class ReciprocalScaler(Scaler):
    def scale(self, value):
        return 1.0 / value

    def inverse_scale(self, value):
        return 1.0 / value


# default scalers per variable kind, identical to the reference's defaults
# (`optimization/variable/{radius,thickness,index,reciprocal_radius,
# asphere_coeff,conic,tilt,decenter}.py`)
_DEFAULT_SCALERS = {
    "radius": LinearScaler(factor=1.0 / 100.0, offset=-1.0),
    "reciprocal_radius": LinearScaler(factor=10.0),
    "conic": IdentityScaler(),
    "thickness": LinearScaler(factor=1.0 / 10.0, offset=-1.0),
    "index": LinearScaler(factor=1.0, offset=-1.5),
    "decenter_x": IdentityScaler(),
    "decenter_y": IdentityScaler(),
    "tilt_x": IdentityScaler(),
    "tilt_y": IdentityScaler(),
    "tilt_z": IdentityScaler(),
    "focal_length": IdentityScaler(),
}


# geometry-coefficient kinds addressing the packed params.coeffs row; the
# logical coefficient index is shifted by extra["offset"] (the layout header
# documented in `geometry/surfaces.py`: chebyshev [norm_x, norm_y, C...],
# zernike/forbes [norm_radius, ...], toroidal [cv_rot, poly...], grid sag
# [xs..., ys..., sag...], NURBS [U, V, W, Px, Py, Pz]). Offsets are computed
# by `geom_coeff_offset` / OptimizationProblem.add_variable (reference
# counterparts: `optimization/variable/{chebyshev,zernike,forbes,grid_sag,
# nurbs,norm_radius}.py`).
_GEOM_COEFF_KINDS = frozenset({
    "chebyshev_coeff", "zernike_coeff", "forbes_coeff", "toroidal_coeff",
    "grid_sag_coeff", "nurbs_cp_z", "geom_coeff",
})


def geom_coeff_offset(static, kind: str, surface_number: int) -> int:
    """Packed-layout offset of logical coefficient 0 for a geometry kind."""
    if kind == "chebyshev_coeff":
        return 2
    if kind in ("zernike_coeff", "forbes_coeff", "toroidal_coeff"):
        return 1
    if kind == "grid_sag_coeff":
        nx, ny = static.geom_aux[surface_number]
        return nx + ny
    if kind == "nurbs_cp_z":
        p, q, nu, nv = static.geom_aux[surface_number][:4]
        return (nu + p + 1) + (nv + q + 1) + 3 * nu * nv
    return 0


@dataclass
class Variable:
    """One optimizable scalar in the system.

    kind: one of _DEFAULT_SCALERS keys.
    surface_number: index into the surface axis.
    coeff_number: coefficient index for asphere/polynomial kinds.
    bounds: optional (min, max) in UNscaled space.
    """

    kind: str
    surface_number: int
    coeff_number: int = 0
    scaler: Scaler | None = None
    bounds: tuple[float | None, float | None] = (None, None)
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.scaler is None:
            if self.kind == "asphere_coeff":
                # order-dependent factor, as the reference
                # (`variable/asphere_coeff.py:49-51`; even asphere order = 2)
                order = self.extra.get("order", 2)
                self.scaler = LinearScaler(
                    factor=10.0 ** (4 + order * self.coeff_number)
                )
            else:
                self.scaler = _DEFAULT_SCALERS.get(self.kind, IdentityScaler())

    # -- raw (unscaled) parameter access -----------------------------------
    def get(self, params):
        s = self.surface_number
        if self.kind == "radius":
            cv = params.cv[s]
            return jnp.where(cv == 0, jnp.inf, 1.0 / cv)
        if self.kind == "reciprocal_radius":
            return params.cv[s]
        if self.kind == "conic":
            return params.conic[s]
        if self.kind == "thickness":
            return params.thickness[s]
        if self.kind == "index":
            return params.mat_coeffs[s, 0]
        if self.kind == "asphere_coeff":
            return params.coeffs[s, self.coeff_number]
        if self.kind == "decenter_x":
            return params.decenter[s, 0]
        if self.kind == "decenter_y":
            return params.decenter[s, 1]
        if self.kind == "tilt_x":
            return params.tilt[s, 0]
        if self.kind == "tilt_y":
            return params.tilt[s, 1]
        if self.kind == "tilt_z":
            return params.tilt[s, 2]
        if self.kind == "focal_length":
            return params.focal_length[s]
        if self.kind in _GEOM_COEFF_KINDS:
            return params.coeffs[s, self.coeff_number
                                 + self.extra.get("offset", 0)]
        if self.kind == "norm_radius":
            # zernike/forbes packed layouts put the normalization radius at
            # slot 0 (reference `variable/norm_radius.py`)
            return params.coeffs[s, 0]
        if self.kind == "norm_x":
            return params.coeffs[s, 0]
        if self.kind == "norm_y":
            return params.coeffs[s, 1]
        raise ValueError(f"Unknown variable kind {self.kind!r}")

    def set(self, params, value):
        s = self.surface_number
        if self.kind == "radius":
            return params.replace(cv=params.cv.at[s].set(1.0 / value))
        if self.kind == "reciprocal_radius":
            return params.replace(cv=params.cv.at[s].set(value))
        if self.kind == "conic":
            return params.replace(conic=params.conic.at[s].set(value))
        if self.kind == "thickness":
            return params.replace(thickness=params.thickness.at[s].set(value))
        if self.kind == "index":
            return params.replace(
                mat_coeffs=params.mat_coeffs.at[s, 0].set(value)
            )
        if self.kind == "asphere_coeff":
            return params.replace(
                coeffs=params.coeffs.at[s, self.coeff_number].set(value)
            )
        if self.kind == "decenter_x":
            return params.replace(decenter=params.decenter.at[s, 0].set(value))
        if self.kind == "decenter_y":
            return params.replace(decenter=params.decenter.at[s, 1].set(value))
        if self.kind == "tilt_x":
            return params.replace(tilt=params.tilt.at[s, 0].set(value))
        if self.kind == "tilt_y":
            return params.replace(tilt=params.tilt.at[s, 1].set(value))
        if self.kind == "tilt_z":
            return params.replace(tilt=params.tilt.at[s, 2].set(value))
        if self.kind == "focal_length":
            return params.replace(
                focal_length=params.focal_length.at[s].set(value)
            )
        if self.kind in _GEOM_COEFF_KINDS:
            j = self.coeff_number + self.extra.get("offset", 0)
            return params.replace(coeffs=params.coeffs.at[s, j].set(value))
        if self.kind in ("norm_radius", "norm_x"):
            return params.replace(coeffs=params.coeffs.at[s, 0].set(value))
        if self.kind == "norm_y":
            return params.replace(coeffs=params.coeffs.at[s, 1].set(value))
        raise ValueError(f"Unknown variable kind {self.kind!r}")

    def __str__(self):
        extra = f"[{self.coeff_number}]" if self.kind == "asphere_coeff" else ""
        return f"{self.kind}{extra}@surface{self.surface_number}"


def apply_all(variables: list[Variable], params, x_scaled):
    """Write the scaled variable vector into a fresh params pytree."""
    for i, v in enumerate(variables):
        params = v.set(params, v.scaler.inverse_scale(x_scaled[i]))
    return params


def initial_values(variables: list[Variable], params):
    """Scaled starting vector from the current params."""
    if not variables:
        return jnp.zeros((0,), params.cv.dtype)
    return jnp.stack([v.scaler.scale(v.get(params)) for v in variables])
