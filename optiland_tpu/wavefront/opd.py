"""OPD analysis facade: per-field wavefront maps, RMS, Zernike decomposition.

User-surface counterpart of the reference's `OPD` / `ZernikeOPD`
(`optiland/wavefront/opd.py:37-245`, `zernike_opd.py:21`). The class is a
thin host shell; all numbers come from the jitted `wavefront_data` pipeline.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.core import distributions as dist
from optiland_tpu.wavefront.core import wavefront_data
from optiland_tpu import zernike as _zernike


class OPD:
    """Optical path difference map for one (field, wavelength)."""

    def __init__(self, optic, field, wavelength=None, num_rings: int = 15,
                 distribution: str = "hexapolar", strategy: str = "chief_ray"):
        self.optic = optic
        self.field = field
        self.wavelength = (
            optic.primary_wavelength if wavelength in (None, "primary")
            else wavelength
        )
        out = dist.generate(distribution, num_rings)
        self.Px, self.Py = out[0], out[1]
        self.strategy = strategy
        static, params = optic.build()
        self.data = jax.jit(
            wavefront_data, static_argnums=(0,),
            static_argnames=("strategy", "aiming")
        )(static, params, field[0], field[1], self.Px, self.Py,
          jnp.asarray(self.wavelength, params.cv.dtype), strategy=strategy,
          aiming=getattr(optic, "ray_aiming", "paraxial"))

    def rms(self):
        """Intensity-masked RMS OPD in waves (reference `opd.py:145-159`)."""
        m = self.data.intensity > 0
        n = jnp.sum(m)
        return jnp.sqrt(jnp.sum(jnp.where(m, self.data.opd**2, 0.0)) / n)

    def peak_to_valley(self):
        m = self.data.intensity > 0
        opd = self.data.opd
        big = jnp.where(m, opd, -jnp.inf)
        small = jnp.where(m, opd, jnp.inf)
        return jnp.max(big) - jnp.min(small)

    def generate_opd_map(self, num_points: int = 256):
        """Interpolate the OPD samples onto a regular grid for plotting
        (reference `opd.py:209-245`, griddata cubic)."""
        from scipy.interpolate import griddata

        m = np.asarray(self.data.intensity) > 0
        x = np.asarray(self.Px)[m]
        y = np.asarray(self.Py)[m]
        z = np.asarray(self.data.opd)[m]
        xi, yi = np.meshgrid(np.linspace(-1, 1, num_points),
                             np.linspace(-1, 1, num_points))
        zi = griddata((x, y), z, (xi, yi), method="cubic")
        return {"x": xi, "y": yi, "z": zi}

    def view(self, projection: str = "2d", num_points: int = 256,
             figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        opd_map = self.generate_opd_map(num_points)
        fig, ax = plt.subplots(figsize=figsize)
        im = ax.imshow(opd_map["z"], extent=(-1, 1, -1, 1), origin="lower")
        ax.set_xlabel("Pupil X")
        ax.set_ylabel("Pupil Y")
        fig.colorbar(im, ax=ax, label="OPD (waves)")
        return fig, ax


class OPDFan:
    """Wavefront-error pupil-slice fans: OPD along the Py and Px axes for
    every (field, wavelength) pair (reference `wavefront/opd_fan.py:27`,
    which traces a "cross" distribution per pair)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 100, strategy: str = "chief_ray"):
        self.optic = optic
        self.fields = (optic.fields.get_field_coords() if fields == "all"
                       else fields)
        self.wavelengths = (optic.wavelengths.values_um
                            if wavelengths == "all" else wavelengths)
        self.pupil_coord = jnp.linspace(-1.0, 1.0, num_rays)
        # x-axis slice first, then y-axis slice (no origin merge, so the two
        # fans index cleanly at [:num_rays] / [num_rays:])
        zeros = jnp.zeros(num_rays)
        Px = jnp.concatenate([self.pupil_coord, zeros])
        Py = jnp.concatenate([zeros, self.pupil_coord])
        static, params = optic.build()
        fn = jax.jit(wavefront_data, static_argnums=(0,),
                     static_argnames=("strategy", "aiming"))
        aiming = getattr(optic, "ray_aiming", "paraxial")
        self.data = [
            [fn(static, params, fx, fy, Px, Py,
                jnp.asarray(w, params.cv.dtype), strategy=strategy,
                aiming=aiming)
             for w in self.wavelengths]
            for fx, fy in self.fields
        ]
        self.num_rays = num_rays

    def fan_y(self, field_idx: int, wl_idx: int):
        """(Py, OPD) along the y pupil axis."""
        d = self.data[field_idx][wl_idx]
        return self.pupil_coord, d.opd[self.num_rays:]

    def fan_x(self, field_idx: int, wl_idx: int):
        """(Px, OPD) along the x pupil axis."""
        d = self.data[field_idx][wl_idx]
        return self.pupil_coord, d.opd[: self.num_rays]

    def view(self, figsize=(10, 3)):
        import matplotlib.pyplot as plt

        nf = len(self.fields)
        fig, axs = plt.subplots(nf, 2, figsize=(figsize[0],
                                                figsize[1] * nf),
                                squeeze=False)
        for i in range(nf):
            for j, w in enumerate(self.wavelengths):
                py, wy = self.fan_y(i, j)
                px, wx = self.fan_x(i, j)
                inten_y = self.data[i][j].intensity[self.num_rays:]
                inten_x = self.data[i][j].intensity[: self.num_rays]
                wy = np.where(np.asarray(inten_y) > 0, np.asarray(wy), np.nan)
                wx = np.where(np.asarray(inten_x) > 0, np.asarray(wx), np.nan)
                axs[i][0].plot(np.asarray(py), wy, label=f"{w:.4f} um")
                axs[i][1].plot(np.asarray(px), wx, label=f"{w:.4f} um")
            axs[i][0].set_xlabel("$P_y$")
            axs[i][0].set_ylabel("OPD (waves)")
            axs[i][1].set_xlabel("$P_x$")
        axs[0][0].legend()
        fig.tight_layout()
        return fig, axs


class ZernikeOPD(OPD):
    """OPD map + Zernike LSQ decomposition (reference `zernike_opd.py:21`)."""

    def __init__(self, optic, field, wavelength=None, num_rings: int = 15,
                 zernike_type: str = "fringe", num_terms: int = 37,
                 strategy: str = "chief_ray"):
        super().__init__(optic, field, wavelength, num_rings=num_rings,
                         strategy=strategy)
        self.zernike_type = zernike_type
        self.num_terms = num_terms
        m = self.data.intensity > 0
        # static-shape LSQ: weight rows by the mask instead of boolean gather
        w = m.astype(self.data.opd.dtype)
        r = jnp.sqrt(self.Px**2 + self.Py**2)
        phi = jnp.arctan2(self.Py, self.Px)
        A = _zernike.design_matrix(zernike_type, num_terms, r, phi) * w[:, None]
        coeffs, *_ = jnp.linalg.lstsq(A, self.data.opd * w)
        self.coeffs = coeffs

    def zernike_terms(self):
        return list(zip(_zernike.indices(self.zernike_type, self.num_terms),
                        np.asarray(self.coeffs)))
