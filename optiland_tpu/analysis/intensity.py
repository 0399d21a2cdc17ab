"""Radiant intensity analysis (reference `analysis/intensity.py:25-433`).

Power per unit solid angle, binned over Zemax-style projection angles
(Angle X = atan2(L, N), Angle Y = atan2(M, N)). The binning is a jittable
scatter-add on-device (differentiable w.r.t. ray powers, like the torch
bilinear path the reference uses under grad mode), and the absolute-units
normalization applies the same tan-space solid-angle Jacobian
J = sec^2(tx) sec^2(ty) / (1 + tan^2 tx + tan^2 ty)^{3/2}
(reference `intensity.py:240-270`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_fields, resolve_wavelengths
from optiland_tpu.core import distributions as dist


def bin_radiant_intensity(L, M, N, power, angle_x_range, angle_y_range,
                          bins, absolute_units: bool = True):
    """Histogram ray directions into an angle-space intensity map.

    Returns (map[Y, X], x_edges, y_edges, x_centers, y_centers) — the map is
    indexed [y_bin, x_bin] as the reference plots it.
    """
    nx, ny = bins
    x_edges = jnp.linspace(angle_x_range[0], angle_x_range[1], nx + 1)
    y_edges = jnp.linspace(angle_y_range[0], angle_y_range[1], ny + 1)
    x_centers = 0.5 * (x_edges[:-1] + x_edges[1:])
    y_centers = 0.5 * (y_edges[:-1] + y_edges[1:])

    valid = ((power > 1e-12) & jnp.isfinite(L) & jnp.isfinite(M)
             & jnp.isfinite(N) & (jnp.abs(N) > 1e-9))
    ax = jnp.degrees(jnp.arctan2(L, N))
    ay = jnp.degrees(jnp.arctan2(M, N))
    inside = (valid & (ax >= angle_x_range[0]) & (ax <= angle_x_range[1])
              & (ay >= angle_y_range[0]) & (ay <= angle_y_range[1]))
    # searchsorted against the edges — np.histogramdd semantics exactly
    # (right-open bins, last edge inclusive); a floor-divide would mis-bin
    # edge-sitting values whose offset cancels in floating point
    ix = jnp.clip(jnp.searchsorted(x_edges, ax, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(y_edges, ay, side="right") - 1, 0, ny - 1)
    w = jnp.where(inside, power, 0.0)
    pmap = jnp.zeros((ny, nx), power.dtype).at[iy, ix].add(w)

    if absolute_units:
        dx = jnp.radians(x_edges[1] - x_edges[0])
        dy = jnp.radians(y_edges[1] - y_edges[0])
        AX, AY = jnp.meshgrid(jnp.radians(x_centers), jnp.radians(y_centers))
        tan2x = jnp.tan(AX) ** 2
        tan2y = jnp.tan(AY) ** 2
        jac = ((1.0 + tan2x) * (1.0 + tan2y)
               / (1.0 + tan2x + tan2y) ** 1.5)
        solid = jac * dx * dy
        pmap = jnp.where(solid > 1e-12, pmap / solid, 0.0)
    return pmap, x_edges, y_edges, x_centers, y_centers


class RadiantIntensity:
    """Radiant intensity maps per (field, wavelength) (reference
    `analysis/intensity.py:25`, RadiantIntensity)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 50_000, distribution: str = "random",
                 num_angular_bins=(64, 64), angle_x_range=(-30.0, 30.0),
                 angle_y_range=(-30.0, 30.0), reference_surface: int = -1,
                 use_absolute_units: bool = True, source=None):
        self.optic = optic
        self.fields = resolve_fields(optic, fields)
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        self.bins = tuple(num_angular_bins)
        self.angle_x_range = angle_x_range
        self.angle_y_range = angle_y_range
        self.reference_surface = reference_surface
        self.data = []
        for fx, fy in self.fields:
            row = []
            for w in self.wavelengths:
                if source is not None:
                    from optiland_tpu.sources import trace_source

                    hist = trace_source(optic, source, num_rays=num_rays,
                                        wavelength=w)
                else:
                    hist = optic.trace(Hx=fx, Hy=fy, wavelength=w,
                                       num_rays=num_rays,
                                       distribution=distribution)
                k = self.reference_surface
                row.append(bin_radiant_intensity(
                    hist.L[k], hist.M[k], hist.N[k], hist.intensity[k],
                    angle_x_range, angle_y_range, self.bins,
                    absolute_units=use_absolute_units))
            self.data.append(row)

    def peak_intensity_values(self):
        """Per-(field, wavelength) map maxima (reference
        `intensity.py:288-299`)."""
        return [[float(jnp.max(cell[0])) for cell in row]
                for row in self.data]

    def cross_section(self, field_idx: int = 0, wl_idx: int = 0,
                      axis: str = "x", position: float | None = None):
        """1-D slice through the intensity map at the given angular position
        (degrees; default: through the peak)."""
        pmap, _, _, xc, yc = self.data[field_idx][wl_idx]
        pm = np.asarray(pmap)
        if axis == "x":
            if position is None:
                row = int(np.unravel_index(pm.argmax(), pm.shape)[0])
            else:
                row = int(np.abs(np.asarray(yc) - position).argmin())
            return np.asarray(xc), pm[row, :]
        if position is None:
            col = int(np.unravel_index(pm.argmax(), pm.shape)[1])
        else:
            col = int(np.abs(np.asarray(xc) - position).argmin())
        return np.asarray(yc), pm[:, col]

    def view(self, figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        nf, nw = len(self.fields), len(self.wavelengths)
        fig, axs = plt.subplots(nf, nw, figsize=figsize, squeeze=False)
        for i in range(nf):
            for j in range(nw):
                pmap, xe, ye, _, _ = self.data[i][j]
                axs[i][j].imshow(
                    np.asarray(pmap), origin="lower",
                    extent=(float(xe[0]), float(xe[-1]),
                            float(ye[0]), float(ye[-1])),
                    aspect="auto")
                axs[i][j].set_xlabel("Angle X (deg)")
                axs[i][j].set_ylabel("Angle Y (deg)")
        fig.tight_layout()
        return fig, axs
