"""Spot diagram analysis.

TPU-first re-design of the reference's `SpotDiagram`
(`analysis/spot_diagram/core.py:50-512`): instead of a Python loop tracing
each (field, wavelength) separately, ONE batched trace covers the full
fields x wavelengths x pupil grid — a single jitted graph whose ray axis can
shard over a device mesh. Zero-intensity (vignetted) rays are handled by
mask-weighted reductions rather than boolean gathers, keeping shapes static;
the resulting centroid/RMS match the reference's masked means exactly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_fields, resolve_wavelengths
from optiland_tpu.core import distributions as dist


def _masked_mean(v, m, axis=None):
    return jnp.sum(v * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


class SpotDiagram:
    """Image-plane intersections per field and wavelength.

    data[f][w] is a dict with x, y, intensity arrays (static shape; clipped
    rays carry intensity 0).
    """

    def __init__(self, optic, fields="all", wavelengths="all", num_rings: int = 6,
                 distribution: str = "hexapolar", reference: str = "chief_ray"):
        self.optic = optic
        self.fields = resolve_fields(optic, fields)
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        self.reference = reference

        prim = optic.primary_wavelength
        self._ref_wl_idx = (
            self.wavelengths.index(prim) if prim in self.wavelengths else 0
        )

        out = dist.generate(distribution, num_rings)
        Px, Py = np.asarray(out[0]), np.asarray(out[1])
        self.num_points = Px.shape[0]

        F, W, P = len(self.fields), len(self.wavelengths), self.num_points
        Hx = np.repeat([f[0] for f in self.fields], W * P)
        Hy = np.repeat([f[1] for f in self.fields], W * P)
        wl = np.tile(np.repeat(self.wavelengths, P), F)
        Pxs = np.tile(Px, F * W)
        Pys = np.tile(Py, F * W)

        static, params = optic.build()
        from optiland_tpu.system.optic import _jit_trace

        hist = _jit_trace(static)(
            params,
            jnp.asarray(Hx, params.cv.dtype), jnp.asarray(Hy, params.cv.dtype),
            jnp.asarray(Pxs, params.cv.dtype), jnp.asarray(Pys, params.cv.dtype),
            jnp.asarray(wl, params.cv.dtype), True,
        )
        self.x = hist.x[-1].reshape(F, W, P)
        self.y = hist.y[-1].reshape(F, W, P)
        self.intensity = hist.intensity[-1].reshape(F, W, P)
        self._mask = (self.intensity > 0).astype(self.x.dtype)

        # reference centers per field
        if reference == "chief_ray":
            ch = _jit_trace(static)(
                params,
                jnp.asarray([f[0] for f in self.fields], params.cv.dtype),
                jnp.asarray([f[1] for f in self.fields], params.cv.dtype),
                jnp.zeros(F, params.cv.dtype), jnp.zeros(F, params.cv.dtype),
                jnp.full(F, self.wavelengths[self._ref_wl_idx], params.cv.dtype),
                True,
            )
            self._cx = ch.x[-1]
            self._cy = ch.y[-1]
        elif reference == "centroid":
            m = self._mask[:, self._ref_wl_idx]
            self._cx = _masked_mean(self.x[:, self._ref_wl_idx], m, axis=-1)
            self._cy = _masked_mean(self.y[:, self._ref_wl_idx], m, axis=-1)
        else:
            raise ValueError(f"Unknown spot reference {reference!r}")

    # -- metrics (reference `core.py:329-370`) ------------------------------
    def centroid(self):
        """Unweighted masked mean of the reference-wavelength spot per field."""
        m = self._mask[:, self._ref_wl_idx]
        cx = _masked_mean(self.x[:, self._ref_wl_idx], m, axis=-1)
        cy = _masked_mean(self.y[:, self._ref_wl_idx], m, axis=-1)
        return [(cx[i], cy[i]) for i in range(len(self.fields))]

    def _centered(self):
        dx = self.x - self._cx[:, None, None]
        dy = self.y - self._cy[:, None, None]
        return dx, dy

    def rms_spot_radius(self):
        """(F, W) RMS spot radii about the reference point."""
        dx, dy = self._centered()
        return jnp.sqrt(_masked_mean(dx**2 + dy**2, self._mask, axis=-1))

    def geometric_spot_radius(self):
        """(F, W) max spot radii about the reference point."""
        dx, dy = self._centered()
        r = jnp.sqrt(dx**2 + dy**2)
        return jnp.max(jnp.where(self._mask > 0, r, 0.0), axis=-1)

    def airy_radius(self, wavelength=None):
        """Airy disc radius 1.22 lambda FNO (mm) at the working F-number."""
        w = wavelength or self.wavelengths[self._ref_wl_idx]
        static, params = self.optic.build()
        from optiland_tpu.system import paraxial as px

        fno = px.FNO(static, params, w)
        return 1.22 * fno * w * 1e-3

    def view(self, figsize=(12, 4), add_airy_disk: bool = False):
        import matplotlib.pyplot as plt

        F = len(self.fields)
        fig, axs = plt.subplots(1, F, figsize=figsize, squeeze=False)
        dx, dy = self._centered()
        dx, dy = np.asarray(dx), np.asarray(dy)
        m = np.asarray(self._mask) > 0
        for i, field in enumerate(self.fields):
            ax = axs[0, i]
            for j, w in enumerate(self.wavelengths):
                sel = m[i, j]
                ax.scatter(dx[i, j][sel], dy[i, j][sel], s=2,
                           label=f"{w:.4f} um")
            ax.set_title(f"Hx={field[0]:.2f}, Hy={field[1]:.2f}")
            ax.set_aspect("equal")
            if add_airy_disk:
                t = np.linspace(0, 2 * np.pi, 100)
                r = float(self.airy_radius())
                ax.plot(r * np.cos(t), r * np.sin(t), "k--", lw=0.8)
        axs[0, -1].legend()
        fig.tight_layout()
        return fig, axs
