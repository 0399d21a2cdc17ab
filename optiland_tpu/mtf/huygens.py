"""Huygens MTF: |DFT| of the Huygens-Fresnel PSF
(reference `mtf/huygens_fresnel.py:19-370`)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.psf.huygens import HuygensPSF


class HuygensMTF:
    def __init__(self, optic, field=(0, 0), wavelength="primary",
                 num_rays: int = 64, image_size: int = 64, max_freq="cutoff",
                 **kwargs):
        self.psf_obj = HuygensPSF(optic, field, wavelength,
                                  num_rays=num_rays, image_size=image_size,
                                  **kwargs)
        self.optic = optic
        psf = self.psf_obj.psf
        center = image_size // 2
        otf = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(psf)))
        dc = otf[center, center]
        self.mtf = [jnp.clip(otf[center:, center][:center] / dc, 0.0, 1.0),
                    jnp.clip(otf[center, center:][:center] / dc, 0.0, 1.0)]
        # frequency axis from the PSF pixel pitch (cycles/mm)
        df = 1.0 / (image_size * float(self.psf_obj.pixel_pitch))
        self.freq = np.arange(center) * df
        if max_freq == "cutoff":
            from optiland_tpu.system import paraxial as px

            static, params = optic.build()
            w = self.psf_obj.wavelength
            self.max_freq = 1.0 / (w * 1e-3 * float(px.FNO(static, params, w)))
        else:
            self.max_freq = float(max_freq)

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        sel = self.freq <= self.max_freq
        ax.plot(self.freq[sel], np.asarray(self.mtf[0])[sel], label="T")
        ax.plot(self.freq[sel], np.asarray(self.mtf[1])[sel], "--", label="S")
        ax.set_xlabel("Spatial frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.set_ylim(0, 1)
        ax.legend()
        ax.grid(True)
        return fig, ax
