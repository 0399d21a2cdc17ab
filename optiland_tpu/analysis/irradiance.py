"""Incoherent detector irradiance (reference `analysis/irradiance.py:35-400`).

Intensity-weighted 2-D binning of image-plane ray hits, implemented as a
jittable scatter-add (`.at[].add`) instead of numpy histogram2d — so an
irradiance map stays on-device and is differentiable w.r.t. lens parameters
(useful for illumination-optimization merits).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_fields, resolve_wavelengths
from optiland_tpu.core import distributions as dist


def bin_irradiance(x, y, power, extent, res):
    """Scatter-add rays into a (res_x, res_y) grid over extent
    ((xmin, xmax), (ymin, ymax)); X is the row index as in the reference."""
    (xmin, xmax), (ymin, ymax) = extent
    nx, ny = res
    # searchsorted against the edges — np.histogram2d semantics (the
    # reference bins with histogram2d, `analysis/irradiance.py:349`); a
    # floor-divide can mis-bin edge-sitting values
    x_edges = jnp.linspace(xmin, xmax, nx + 1)
    y_edges = jnp.linspace(ymin, ymax, ny + 1)
    ix = jnp.clip(jnp.searchsorted(x_edges, x, side="right") - 1, 0, nx - 1)
    iy = jnp.clip(jnp.searchsorted(y_edges, y, side="right") - 1, 0, ny - 1)
    inside = ((x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax))
    w = jnp.where(inside, power, 0.0)
    grid = jnp.zeros((nx, ny), power.dtype).at[ix, iy].add(w)
    # normalize to irradiance (power per unit area)
    px_area = (xmax - xmin) / nx * (ymax - ymin) / ny
    return grid / px_area


class IncoherentIrradiance:
    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 50_000, res=(64, 64), px_size=None,
                 detector_surface: int = -1, distribution: str = "random"):
        self.optic = optic
        self.fields = resolve_fields(optic, fields)
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        self.res = res
        self.detector_surface = detector_surface

        out = dist.generate(distribution, num_rays)
        Px, Py = np.asarray(out[0]), np.asarray(out[1])
        P = Px.shape[0]
        F, W = len(self.fields), len(self.wavelengths)
        Hx = np.repeat([f[0] for f in self.fields], W * P)
        Hy = np.repeat([f[1] for f in self.fields], W * P)
        wl = np.tile(np.repeat(self.wavelengths, P), F)
        hist = optic.trace_generic(Hx, Hy, np.tile(Px, F * W),
                                   np.tile(Py, F * W),
                                   wavelength=jnp.asarray(wl))
        x = hist.x[self.detector_surface].reshape(F, W, P)
        y = hist.y[self.detector_surface].reshape(F, W, P)
        i = hist.intensity[self.detector_surface].reshape(F, W, P)

        # detector extent: physical aperture if defined, else data bounds
        spec = optic.surfaces.specs[detector_surface]
        if px_size is not None:
            hx = px_size[0] * res[0] / 2
            hy = px_size[1] * res[1] / 2
            extent = ((-hx, hx), (-hy, hy))
        elif spec.semi_aperture is not None:
            r = spec.semi_aperture
            extent = ((-r, r), (-r, r))
        else:
            pad = 1.05
            xm = float(jnp.max(jnp.abs(jnp.where(i > 0, x, 0.0)))) * pad
            ym = float(jnp.max(jnp.abs(jnp.where(i > 0, y, 0.0)))) * pad
            extent = ((-xm, xm), (-ym, ym))
        self.extent = extent

        self.data = [
            [bin_irradiance(x[f, w], y[f, w], i[f, w], extent, res)
             for w in range(W)]
            for f in range(F)
        ]

    def peak_irradiance(self):
        return [[float(jnp.max(g)) for g in row] for row in self.data]

    def view(self, figsize=(6, 5), cmap="inferno"):
        import matplotlib.pyplot as plt

        F, W = len(self.fields), len(self.wavelengths)
        fig, axs = plt.subplots(F, W, figsize=figsize, squeeze=False)
        (xmin, xmax), (ymin, ymax) = self.extent
        for f in range(F):
            for w in range(W):
                im = axs[f, w].imshow(np.asarray(self.data[f][w]).T,
                                      origin="lower", cmap=cmap,
                                      extent=(xmin, xmax, ymin, ymax))
                fig.colorbar(im, ax=axs[f, w])
        fig.tight_layout()
        return fig, axs
