"""Differentiable cubic B-spline grid interpolation.

JAX re-implementation of the reference's numpy-backend `GridInterpolator`
(`optiland/phase/interpolators.py:22-70`), which wraps
`scipy.interpolate.RectBivariateSpline` (an interpolating bicubic
tensor-product B-spline). Identical construction:

  - FITPACK interpolating knot vector: 4-fold end knots, interior knots at
    the data sites x_2 .. x_{n-3} (the second and second-to-last sites are
    dropped — FITPACK's choice for an s=0 cubic spline),
  - spline coefficients from the 1-D collocation systems B c = z per axis.

The collocation matrices depend only on the grid SIZE (queries and knots
live in uniform index space — the packed grid representation stores
(xmin, xmax, ymin, ymax) bounds, i.e. uniform grids, matching the torch
`grid_sample` path of the reference), so their inverses are host-side
`lru_cache` constants and the grid-values -> coefficients map stays a
LINEAR, differentiable contraction: C = Ainv_y @ Z @ Ainv_x^T. Evaluation
gathers the 4x4 nonzero-basis block per query — smooth in (x, y), so
`jax.jvp`/`jax.grad` give exact spline derivatives.

Out-of-bounds queries clamp to the boundary (the reference extrapolates the
edge polynomial; clamping is the TPU-safe choice and only differs outside
the table).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_DEG = 3  # cubic


def fitpack_knots(n: int) -> np.ndarray:
    """Index-space FITPACK interpolating knot vector for n uniform sites."""
    if n < 4:
        raise ValueError("cubic spline interpolation needs >= 4 grid points")
    return np.concatenate([
        np.zeros(4), np.arange(2, n - 2, dtype=float), np.full(4, n - 1.0)])


def _basis4_np(t: np.ndarray, j: int, u: float) -> np.ndarray:
    """The 4 nonzero cubic basis values B_{j-3..j}(u) (NURBS Book A2.2)."""
    left = np.zeros(_DEG + 1)
    right = np.zeros(_DEG + 1)
    N = np.zeros(_DEG + 1)
    N[0] = 1.0
    for r in range(1, _DEG + 1):
        left[r] = u - t[j + 1 - r]
        right[r] = t[j + r] - u
        saved = 0.0
        for i in range(r):
            den = right[i + 1] + left[r - i]
            tmp = N[i] / den if den != 0 else 0.0
            N[i] = saved + right[i + 1] * tmp
            saved = left[r - i] * tmp
        N[r] = saved
    return N


def _interval_np(t: np.ndarray, u: float) -> int:
    n = len(t) - _DEG - 1  # number of basis functions
    j = int(np.searchsorted(t, u, side="right") - 1)
    return min(max(j, _DEG), n - 1)


@lru_cache(maxsize=64)
def collocation_inverse(n: int) -> np.ndarray:
    """Inverse of the cubic B-spline collocation matrix B[i, j] = B_j(i)
    for n uniform sites in index space (static per grid size)."""
    t = fitpack_knots(n)
    B = np.zeros((n, n))
    for i in range(n):
        j = _interval_np(t, float(i))
        B[i, j - _DEG: j + 1] = _basis4_np(t, j, float(i))
    return np.linalg.inv(B)


def spline_coefficients_2d(grid, ny: int, nx: int):
    """(ny, nx) grid values -> bicubic spline coefficients (linear map,
    differentiable w.r.t. the grid)."""
    Ay = jnp.asarray(collocation_inverse(ny), grid.dtype)
    Ax = jnp.asarray(collocation_inverse(nx), grid.dtype)
    return Ay @ grid[:ny, :nx] @ Ax.T


def _basis4(t, j, u):
    """Vectorized 4 nonzero cubic basis values at u (index space). `t` is a
    static numpy knot vector; j, u are arrays."""
    tj = jnp.asarray(t, u.dtype)
    N0 = jnp.ones_like(u)
    Ns = [N0]
    for r in range(1, _DEG + 1):
        left = [u - tj[j + 1 - rr] for rr in range(r + 1)]
        right = [tj[j + rr] - u for rr in range(r + 1)]
        new = []
        saved = jnp.zeros_like(u)
        for i in range(r):
            den = right[i + 1] + left[r - i]
            tmp = jnp.where(jnp.abs(den) > 1e-12, Ns[i] / jnp.where(
                jnp.abs(den) > 1e-12, den, 1.0), 0.0)
            new.append(saved + right[i + 1] * tmp)
            saved = left[r - i] * tmp
        new.append(saved)
        Ns = new
    return jnp.stack(Ns, axis=-1)  # (..., 4)


def _interval(t, u, n_basis: int):
    tj = jnp.asarray(t, u.dtype)
    j = jnp.searchsorted(tj, u, side="right") - 1
    return jnp.clip(j, _DEG, n_basis - 1)


def bicubic_eval(C, ny: int, nx: int, u, v):
    """Evaluate the bicubic spline with coefficient matrix C at index-space
    coordinates (u, v) = (x index, y index). Clamps to the table."""
    tx = fitpack_knots(nx)
    ty = fitpack_knots(ny)
    u = jnp.clip(u, 0.0, nx - 1.0)
    v = jnp.clip(v, 0.0, ny - 1.0)
    jx = _interval(tx, u, nx)
    jy = _interval(ty, v, ny)
    bx = _basis4(tx, jx, u)  # (..., 4)
    by = _basis4(ty, jy, v)
    # gather the 4x4 coefficient block: C[jy-3+a, jx-3+b]
    rows = jy[..., None] - _DEG + jnp.arange(_DEG + 1)  # (..., 4)
    cols = jx[..., None] - _DEG + jnp.arange(_DEG + 1)
    flat = C.reshape(-1)
    idx = rows[..., :, None] * nx + cols[..., None, :]  # (..., 4, 4)
    block = jnp.take(flat, idx, axis=0)
    return jnp.einsum("...a,...ab,...b->...", by, block, bx)


def grid_cubic(grid, bounds, gy: int, gx: int, x, y):
    """Bicubic-spline sample + analytic gradient of a (gy, gx) table over
    the rectangle `bounds` = (xmin, xmax, ymin, ymax) — the cubic
    counterpart of `trace/phase.grid_bilinear`, matching the reference's
    scipy `RectBivariateSpline` to ~1e-9 on interior queries.

    Returns (value, d/dx, d/dy); differentiable w.r.t. the grid and the
    query coordinates."""
    xmin, xmax, ymin, ymax = bounds[0], bounds[1], bounds[2], bounds[3]
    sx = (gx - 1) / (xmax - xmin)
    sy = (gy - 1) / (ymax - ymin)
    C = spline_coefficients_2d(grid, gy, gx)

    def f(xq, yq):
        return bicubic_eval(C, gy, gx, (xq - xmin) * sx, (yq - ymin) * sy)

    val, dvdx = jax.jvp(lambda xq: f(xq, y), (x,), (jnp.ones_like(x),))
    _, dvdy = jax.jvp(lambda yq: f(x, yq), (y,), (jnp.ones_like(y),))
    return val, dvdx, dvdy
