"""Encircled energy (reference `analysis/encircled_energy.py:23-196`)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.spot import SpotDiagram


class EncircledEnergy(SpotDiagram):
    """Fraction of energy inside a radius about the centroid, per field.

    Uses a random pupil distribution like the reference (energy weighting by
    ray intensity; geometric, not diffraction).
    """

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays: int = 100_000, num_points: int = 256):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.num_points_curve = num_points
        super().__init__(optic, fields=fields, wavelengths=[float(wavelength)],
                         num_rings=num_rays, distribution="random",
                         reference="centroid")

    def centroid(self):
        """Energy-weighted centroid per field (reference overrides the
        geometric centroid with an intensity weighting)."""
        i = self.intensity[:, 0]
        wsum = jnp.sum(i, axis=-1) + 1e-12
        cx = jnp.sum(self.x[:, 0] * i, axis=-1) / wsum
        cy = jnp.sum(self.y[:, 0] * i, axis=-1) / wsum
        return [(cx[k], cy[k]) for k in range(len(self.fields))]

    def encircled_energy(self, radii=None):
        """(F, R) fraction-of-energy curves; radii default to a linspace to
        the max spot extent per field."""
        cents = self.centroid()
        curves = []
        radii_out = []
        for k in range(len(self.fields)):
            cx, cy = cents[k]
            r = jnp.sqrt((self.x[k, 0] - cx) ** 2 + (self.y[k, 0] - cy) ** 2)
            i = self.intensity[k, 0]
            total = jnp.sum(i) + 1e-12
            rmax = jnp.max(jnp.where(i > 0, r, 0.0))
            rr = (jnp.linspace(0, 1.2, self.num_points_curve) * rmax
                  if radii is None else jnp.asarray(radii))
            frac = jnp.sum(
                jnp.where(r[None, :] <= rr[:, None], i[None, :], 0.0), axis=-1
            ) / total
            curves.append(frac)
            radii_out.append(rr)
        return radii_out, curves

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        radii, curves = self.encircled_energy()
        fig, ax = plt.subplots(figsize=figsize)
        for k, field in enumerate(self.fields):
            ax.plot(np.asarray(radii[k]), np.asarray(curves[k]),
                    label=f"Hy={field[1]:.2f}")
        ax.set_xlabel("Radius (mm)")
        ax.set_ylabel("Encircled energy fraction")
        ax.legend()
        ax.grid(True)
        return fig, ax
