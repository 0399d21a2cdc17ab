"""FFT MTF (reference `mtf/fft.py:19-299`): |FFT(PSF)| slices normalized to
the DC bin, frequency axes from the per-field working F-number."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.core.resolve import resolve_fields
from optiland_tpu.psf.fft import FFTPSF, calculate_grid_size
from optiland_tpu.system import paraxial as px


class FFTMTF:
    """Tangential/sagittal MTF per field at one wavelength."""

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays: int = 128, grid_size: int | None = None,
                 max_freq="cutoff"):
        self.optic = optic
        self.fields = resolve_fields(optic, fields)
        self.wavelength = (
            optic.primary_wavelength if wavelength == "primary"
            else float(wavelength)
        )
        if grid_size is None:
            num_rays, grid_size = calculate_grid_size(num_rays)
        self.num_rays = num_rays
        self.grid_size = grid_size

        static, params = optic.build()
        self._fno = float(px.FNO(static, params, self.wavelength))
        if max_freq == "cutoff":
            self.max_freq = 1.0 / (self.wavelength * 1e-3 * self._fno)
        else:
            self.max_freq = float(max_freq)

        center = grid_size // 2
        self.mtf = []
        self.freq_tang = []
        self.freq_sag = []
        for field in self.fields:
            psf = FFTPSF(optic, field, wavelength=[self.wavelength],
                         num_rays=num_rays, grid_size=grid_size).psf
            otf = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(psf)))
            dc = otf[center, center]
            tang = jnp.clip(otf[center:, center][:center] / dc, 0.0, 1.0)
            sag = jnp.clip(otf[center, center:][:center] / dc, 0.0, 1.0)
            self.mtf.append([tang, sag])
            # frequency steps (cycles/mm); on-axis FNO approximation for the
            # per-field working FNO refinement (reference `mtf/fft.py:196-236`)
            df = 1.0 / ((num_rays - 1) * self.wavelength * 1e-3 * self._fno)
            k = np.arange(center)
            self.freq_tang.append(k * df)
            self.freq_sag.append(k * df)
        self.freq = self.freq_tang

    def view(self, figsize=(10, 7)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        for i, field in enumerate(self.fields):
            t, s = self.mtf[i]
            sel = self.freq_tang[i] <= self.max_freq
            ax.plot(self.freq_tang[i][sel], np.asarray(t)[sel],
                    label=f"Hy={field[1]:.2f} T")
            ax.plot(self.freq_sag[i][sel], np.asarray(s)[sel], "--",
                    label=f"Hy={field[1]:.2f} S")
        ax.set_xlabel("Spatial frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.set_ylim(0, 1)
        ax.legend()
        ax.grid(True)
        return fig, ax
