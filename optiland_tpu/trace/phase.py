"""Phase-profile evaluation shared by the real-ray tracer and the paraxial
engine.

Covers the reference's five phase profiles
(`optiland/phase/{constant,radial,linear_grating,grid,height_profile}.py`):
analytic kinds plus tabulated grids with differentiable interpolation:
bicubic-spline by default (exact semantics of the reference's numpy path,
scipy RectBivariateSpline via `core/interpolation.py`) or bilinear
(`phase_interp="linear"`, the reference's torch `grid_sample` order and
the cheaper TPU variant).
Height profiles convert a height map and a dispersive material into phase:
phi(x, y, λ) = 2π/(λ·1e-3) · (n(λ) − 1) · h(x, y)
(`phase/height_profile.py:62-82`; λ in µm, heights/lengths in mm).
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.materials.dispersion import material_index
from optiland_tpu.system.spec import (
    PHASE_CONSTANT,
    PHASE_GRID,
    PHASE_HEIGHT,
    PHASE_LINEAR_GRATING,
    PHASE_RADIAL,
)


def grid_bilinear(grid, bounds, gy: int, gx: int, x, y):
    """Differentiable bilinear sample + analytic gradient of a (gy, gx)
    table over the rectangle `bounds` = (xmin, xmax, ymin, ymax).

    Queries outside the rectangle clamp to the edge (gradient from the
    edge cell). Returns (value, d/dx, d/dy)."""
    xmin, xmax, ymin, ymax = bounds[0], bounds[1], bounds[2], bounds[3]
    sx = (gx - 1) / (xmax - xmin)
    sy = (gy - 1) / (ymax - ymin)
    u = jnp.clip((x - xmin) * sx, 0.0, gx - 1.0)
    v = jnp.clip((y - ymin) * sy, 0.0, gy - 1.0)
    u0 = jnp.clip(jnp.floor(u), 0, gx - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, gy - 2).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    g = grid[:gy, :gx]
    g00 = g[v0, u0]
    g01 = g[v0, u0 + 1]
    g10 = g[v0 + 1, u0]
    g11 = g[v0 + 1, u0 + 1]
    val = (g00 * (1 - fu) * (1 - fv) + g01 * fu * (1 - fv)
           + g10 * (1 - fu) * fv + g11 * fu * fv)
    dvdx = ((g01 - g00) * (1 - fv) + (g11 - g10) * fv) * sx
    dvdy = ((g10 - g00) * (1 - fu) + (g11 - g01) * fu) * sy
    return val, dvdx, dvdy


def _height_factor(static, params, k, w):
    """2π/(λ·1e-3)·(n(λ)−1) for the height-profile material at surface k."""
    aux = static.phase_aux[k]
    n = material_index(aux[3], aux[4], params.phase_mat_coeffs[k], w)
    return 2.0 * jnp.pi / (w * 1e-3) * (n - 1.0)


def phase_value_grad(static, params, k, x, y, w):
    """Phase (radians) and its (x, y) gradient at surface k (reference
    `phase/*.py` get_phase / get_gradient)."""
    kind = static.phase_kinds[k]
    p = params.phase_params[k]
    if kind == PHASE_CONSTANT:
        z = jnp.zeros_like(x)
        return p[0] + z, z, z
    if kind == PHASE_RADIAL:
        r2 = x * x + y * y
        phase = jnp.zeros_like(x)
        dphi_dr2 = jnp.zeros_like(x)
        rp = r2
        for ci in range(p.shape[0]):
            phase = phase + p[ci] * rp
            dphi_dr2 = dphi_dr2 + p[ci] * (ci + 1) * jnp.where(
                r2 > 0, rp / jnp.maximum(r2, 1e-30), 0.0)
            rp = rp * r2
        return phase, 2.0 * x * dphi_dr2, 2.0 * y * dphi_dr2
    if kind == PHASE_LINEAR_GRATING:
        return p[0] * x + p[1] * y, p[0] + 0.0 * x, p[1] + 0.0 * y
    if kind == PHASE_GRID:
        aux = static.phase_aux[k]
        return _grid_sample(static, params.phase_grids[k], p, aux[1],
                            aux[2], x, y)
    if kind == PHASE_HEIGHT:
        aux = static.phase_aux[k]
        h, dhx, dhy = _grid_sample(static, params.phase_grids[k], p, aux[1],
                                   aux[2], x, y)
        f = _height_factor(static, params, k, w)
        return f * h, f * dhx, f * dhy
    raise ValueError(f"Unknown phase kind {kind}")


def _grid_sample(static, grid, bounds, gy, gx, x, y):
    """Dispatch on the build-time interpolation order: "cubic" is the
    reference-parity default (scipy RectBivariateSpline semantics, matched
    to ~1e-9 by `core/interpolation.py`); "linear" is the reference's torch
    `grid_sample` order and the cheaper TPU path."""
    if static.phase_interp == "linear":
        return grid_bilinear(grid, bounds, gy, gx, x, y)
    from optiland_tpu.core.interpolation import grid_cubic

    return grid_cubic(grid, bounds, gy, gx, x, y)


def paraxial_phase_gradient(static, params, k, y, w):
    """d phi/dy along the meridian x=0 (reference
    `phase/*.py` get_paraxial_gradient), used by the paraxial engine's
    INT_PHASE branch."""
    x0 = jnp.zeros_like(y)
    _, _, gy = phase_value_grad(static, params, k, x0, y, w)
    return gy
