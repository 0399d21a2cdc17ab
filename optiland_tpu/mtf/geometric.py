"""Geometric MTF from spot-diagram line-spread functions
(reference `mtf/geometric.py:27-205`; Smith, Modern Optical Engineering
section 11.9). Histogram + cosine/sine transform, vectorized over the
frequency axis instead of the reference's per-frequency Python loop."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.spot import SpotDiagram
from optiland_tpu.system import paraxial as px


def _lsf_mtf(xi, mask, freqs, num_points):
    """MTF of a 1-D intensity histogram of coordinates xi (masked)."""
    lo = jnp.min(jnp.where(mask > 0, xi, jnp.inf))
    hi = jnp.max(jnp.where(mask > 0, xi, -jnp.inf))
    span = jnp.maximum(hi - lo, 1e-12)
    edges = lo + span * jnp.arange(num_points + 2) / (num_points + 1)
    x = (edges[1:] + edges[:-1]) / 2.0
    idx = jnp.clip(((xi - lo) / span * (num_points + 1)).astype(jnp.int32),
                   0, num_points)
    A = jnp.zeros(num_points + 1, xi.dtype).at[idx].add(mask)
    dx = x[1] - x[0]
    total = jnp.sum(A * dx)
    arg = 2.0 * jnp.pi * freqs[:, None] * x[None, :]
    Ac = jnp.sum(A[None, :] * jnp.cos(arg) * dx, axis=-1) / total
    As = jnp.sum(A[None, :] * jnp.sin(arg) * dx, axis=-1) / total
    return jnp.sqrt(Ac**2 + As**2)


class GeometricMTF(SpotDiagram):
    """Spot-based geometric MTF per field."""

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays: int = 100, distribution: str = "uniform",
                 num_points: int = 256, max_freq="cutoff", scale: bool = True):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        super().__init__(optic, fields=fields, wavelengths=[float(wavelength)],
                         num_rings=num_rays, distribution=distribution)
        self.num_points = num_points
        self.scale = scale

        static, params = optic.build()
        fno = float(px.FNO(static, params, wavelength))
        if max_freq == "cutoff":
            self.max_freq = 1.0 / (wavelength * 1e-3 * fno)
        else:
            self.max_freq = float(max_freq)

        self.freq = jnp.linspace(0.0, self.max_freq, num_points)
        # diffraction-limited scaling curve (Smith 11.9)
        v = self.freq / self.max_freq
        self.diff_limited_mtf = (2.0 / jnp.pi) * (
            jnp.arccos(v) - v * jnp.sqrt(1.0 - v**2)
        )

        self.mtf = []
        for k in range(len(self.fields)):
            m = self._mask[k, 0]
            scale_t = self.diff_limited_mtf if scale else 1.0
            tan = _lsf_mtf(self.y[k, 0], m, self.freq, num_points) * scale_t
            sag = _lsf_mtf(self.x[k, 0], m, self.freq, num_points) * scale_t
            self.mtf.append([tan, sag])

    def view(self, figsize=(10, 7), add_reference: bool = False):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        f = np.asarray(self.freq)
        for i, field in enumerate(self.fields):
            t, s = self.mtf[i]
            ax.plot(f, np.asarray(t), label=f"Hy={field[1]:.2f} T")
            ax.plot(f, np.asarray(s), "--", label=f"Hy={field[1]:.2f} S")
        if add_reference:
            ax.plot(f, np.asarray(self.diff_limited_mtf), "k:",
                    label="diffraction limit")
        ax.set_xlabel("Spatial frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.set_ylim(0, 1)
        ax.legend()
        ax.grid(True)
        return fig, ax
