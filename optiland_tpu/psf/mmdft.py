"""Matrix-method DFT (chirp-z style zoomed) PSF.

Counterpart of the reference's `MMDFTPSF` (`psf/mmdft.py:19-300`): the image
field is L @ pupil @ R with DFT kernel matrices, giving an arbitrarily
sampled (zoomed) PSF without zero-padding. The triple product is two complex
matmuls — exactly what the MXU is for.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu import config

from optiland_tpu.psf.fft import _pupil_grid, calculate_grid_size
from optiland_tpu.system import paraxial as px


class MMDFTPSF:
    def __init__(self, optic, field, wavelength="primary", num_rays: int = 128,
                 image_size: int | None = None, pixel_pitch: float | None = None,
                 strategy: str = "chief_ray"):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.wavelength = float(wavelength)
        num_rays_eff, grid_size = calculate_grid_size(num_rays)
        self.num_rays = num_rays_eff

        static, params = optic.build()
        fno = float(px.FNO(static, params, self.wavelength))
        clear_size = self.num_rays - 1
        # sampling defaults mirror the reference (`psf/mmdft.py:100-130`)
        if image_size is None and pixel_pitch is None:
            image_size = grid_size
        if pixel_pitch is None:
            pixel_pitch = self.wavelength * fno * clear_size / image_size
        elif image_size is None:
            image_size = int(self.wavelength * fno * clear_size / pixel_pitch)
        self.image_size = image_size
        self.pixel_pitch = pixel_pitch

        pad_size = self.wavelength * fno * clear_size / pixel_pitch
        if image_size > pad_size:
            raise ValueError(
                f"Supplied image_size of {image_size} not less than or equal "
                f"to calculated pad size of {int(pad_size)}. Consider "
                "increasing num_rays."
            )

        @jax.jit
        def compute(params):
            pupil = _pupil_grid(static, params, field[0], field[1],
                                jnp.asarray(self.wavelength, params.cv.dtype),
                                self.num_rays, strategy)
            pc = jnp.arange(self.num_rays) - self.num_rays // 2
            ic = jnp.arange(image_size) - image_size // 2
            pdt = config.phase_dtype()  # c64 on TPU (no C128 support)
            iu = config.imag_unit()
            right = jnp.exp(
                -2 * iu * (jnp.pi * jnp.outer(pc, ic) / pad_size).astype(pdt))
            left = jnp.exp(
                -2 * iu * (jnp.pi * jnp.outer(ic, pc) / pad_size).astype(pdt))
            G = left @ (pupil @ right)
            psf = jnp.real(G * jnp.conj(G))
            # DL normalization: uniform unit pupil through the same kernels
            ideal = jnp.where(jnp.abs(pupil) > 0,
                              jnp.asarray(1.0 + 0j, pupil.dtype), 0.0)
            G0 = left @ (ideal @ right)
            peak = jnp.max(jnp.real(G0 * jnp.conj(G0)))
            return psf / peak * 100.0

        self.psf = compute(params)

    def strehl_ratio(self):
        c = self.image_size // 2
        return self.psf[c, c] / 100.0

    def view(self, log: bool = False, figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        img = np.asarray(self.psf)
        half = self.pixel_pitch * self.image_size / 2
        fig, ax = plt.subplots(figsize=figsize)
        data = np.log10(np.maximum(img, 1e-9)) if log else img
        im = ax.imshow(data, extent=(-half, half, -half, half), origin="lower")
        ax.set_xlabel("Image X (um)")
        ax.set_ylabel("Image Y (um)")
        fig.colorbar(im, ax=ax)
        return fig, ax
