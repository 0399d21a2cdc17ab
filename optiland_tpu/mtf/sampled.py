"""Sampled MTF: pupil autocorrelation via a Zernike wavefront fit
(reference `mtf/sampled.py:17-207`). Vectorized over the frequency list —
the shifted-pupil overlap for every (fx, fy) evaluates in one jitted graph.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu import config
from optiland_tpu import zernike as _z
from optiland_tpu.core import distributions as dist
from optiland_tpu.system import paraxial as px
from optiland_tpu.wavefront.core import wavefront_data


class SampledMTF:
    def __init__(self, optic, field=(0, 0), wavelength="primary",
                 num_rays: int = 32, distribution: str = "uniform",
                 zernike_terms: int = 37, zernike_type: str = "fringe"):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.wavelength = float(wavelength)
        self.zernike_type = zernike_type
        self.zernike_terms = zernike_terms

        out = dist.generate(distribution, num_rays)
        Px, Py = out[0], out[1]
        static, params = optic.build()
        data = jax.jit(wavefront_data, static_argnums=(0,),
                       static_argnames=("strategy", "aiming"))(
            static, params, field[0], field[1], Px, Py,
            jnp.asarray(self.wavelength, params.cv.dtype),
            aiming=getattr(optic, "ray_aiming", "paraxial"))
        self.x_norm = Px
        self.y_norm = Py
        self.intensity = data.intensity
        self.opd_waves = data.opd
        self.xpd = float(px.XPD(static, params, self.wavelength))
        self.xpl = float(px.XPL(static, params, self.wavelength))

        # Zernike fit of the wavefront (mask-weighted LSQ, static shapes)
        w = (self.intensity > 0).astype(self.opd_waves.dtype)
        r = jnp.sqrt(Px**2 + Py**2)
        phi = jnp.arctan2(Py, Px)
        A = _z.design_matrix(zernike_type, zernike_terms, r, phi) * w[:, None]
        self.zernike_coeffs, *_ = jnp.linalg.lstsq(A, self.opd_waves * w)

        pdt = config.phase_dtype()  # c64 on TPU (no C128 support)
        iu = config.imag_unit()
        self.P1 = (jnp.sqrt(self.intensity).astype(pdt)
                   * jnp.exp(iu * (2 * jnp.pi * self.opd_waves).astype(pdt)))
        self.otf_at_zero = jnp.sum(self.intensity)

    def calculate_mtf(self, frequencies):
        """MTF at (fx, fy) pairs in cycles/mm (reference
        `mtf/sampled.py:108-207`)."""
        if self.xpd == 0.0:
            return [1.0 if fx == 0 and fy == 0 else 0.0
                    for fx, fy in frequencies]
        wl_mm = self.wavelength * 1e-3
        fxy = jnp.asarray(frequencies, float)  # (F, 2)

        def one(f):
            fx, fy = f[0], f[1]
            delta_x = self.xpl * (wl_mm * fx) / (self.xpd / 2.0)
            delta_y = self.xpl * (wl_mm * fy) / (self.xpd / 2.0)
            xs = self.x_norm - delta_x
            ys = self.y_norm - delta_y
            r = jnp.sqrt(xs**2 + ys**2)
            phi = jnp.arctan2(ys, xs)
            opd_shift = _z.evaluate(self.zernike_type, self.zernike_coeffs,
                                    r, phi)
            pdt = config.phase_dtype()
            P2c = (jnp.sqrt(self.intensity).astype(pdt)
                   * jnp.exp(-config.imag_unit()
                             * (2 * jnp.pi * opd_shift).astype(pdt)))
            P2c = jnp.where(r > 1.0, 0.0 + 0.0j, P2c)
            otf = jnp.sum(self.P1 * P2c)
            return jnp.abs(otf / self.otf_at_zero)

        return [float(v) for v in jax.vmap(one)(fxy)]


_ = np
