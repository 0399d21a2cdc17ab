"""FFT MTF (reference `mtf/fft.py:19-299`): |FFT(PSF)| slices normalized to
the DC bin, frequency axes from the per-field WORKING F-number (reference
`utils.py:45-107`), with the tangential axis corrected back to the flat
image plane by the chief-ray tilt factor FNO_on/FNO_off
(`mtf/fft.py:196-236`). `FFTMTF` is a factory that returns the vectorial
variant when the optic carries a polarization state (`mtf/fft.py:238-299`,
`mtf/vectorial_fft.py`)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.core.resolve import resolve_fields
from optiland_tpu.psf.fft import (
    ScalarFFTPSF,
    VectorialFFTPSF,
    calculate_grid_size,
)
from optiland_tpu.system import paraxial as px  # noqa: F401  (index_table)

_MAX_FNUM = 1e4


def get_working_FNO(optic, field, wavelength) -> float:
    """Per-field working F-number (reference `utils.py:45-107`): trace the
    chief ray plus the four pupil-edge marginal rays, average the squared
    NAs of the unvignetted marginals relative to the chief direction."""
    Hx, Hy = field
    static, params = optic.build()
    n_img = float(px.index_table(static, params, wavelength)[-1])

    Px = jnp.asarray([0.0, 0.0, 0.0, 1.0, -1.0])
    Py = jnp.asarray([0.0, 1.0, -1.0, 0.0, 0.0])
    h = optic.trace_generic(Hx=Hx, Hy=Hy, Px=Px, Py=Py,
                            wavelength=wavelength)
    L = np.asarray(h.L[-1])
    M = np.asarray(h.M[-1])
    N = np.asarray(h.N[-1])
    i = np.asarray(h.intensity[-1])
    dot = np.clip(L[0] * L[1:] + M[0] * M[1:] + N[0] * N[1:], -1.0, 1.0)
    na_sq = (n_img * np.sin(np.arccos(dot))) ** 2
    live = i[1:] > 0
    avg = float(np.mean(na_sq[live])) if live.any() else float(np.mean(na_sq))
    if avg <= 0:
        return _MAX_FNUM
    fno = 1.0 / (2.0 * np.sqrt(avg))
    if not np.isfinite(fno):
        raise ValueError(
            "Working F/# could not be calculated due to raytrace errors.")
    return min(fno, _MAX_FNUM)


class ScalarFFTMTF:
    """Tangential/sagittal MTF per field at one wavelength (scalar PSF)."""

    _psf_cls = ScalarFFTPSF

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays: int = 128, grid_size: int | None = None,
                 max_freq="cutoff", strategy: str = "chief_ray"):
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
        self.strategy = strategy

        # on-axis WORKING F/# (reference `mtf/base.py:174-185` always
        # evaluates get_working_FNO at (0, 0), not the paraxial F/#)
        self._fno_on_axis = get_working_FNO(optic, (0.0, 0.0),
                                            self.wavelength)
        # per-field working F-number (reference `mtf/fft.py:78-82`)
        self.FNO = [get_working_FNO(optic, f, self.wavelength)
                    for f in self.fields]
        if max_freq == "cutoff":
            self.max_freq = 1.0 / (self.wavelength * 1e-3 * self._fno_on_axis)
        else:
            self.max_freq = float(max_freq)

        center = grid_size // 2
        self.mtf = []
        self.freq_tang = []
        self.freq_sag = []
        for k, field in enumerate(self.fields):
            psf = self._psf_cls(optic, field, wavelength=[self.wavelength],
                                num_rays=num_rays, grid_size=grid_size,
                                strategy=strategy).psf
            otf = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(psf)))
            dc = otf[center, center]
            tang = jnp.clip(otf[center:, center][:center] / dc, 0.0, 1.0)
            sag = jnp.clip(otf[center, center:][:center] / dc, 0.0, 1.0)
            self.mtf.append([tang, sag])
            ks = np.arange(center)
            self.freq_tang.append(ks * self._mtf_units_tang(k))
            self.freq_sag.append(ks * self._mtf_units_sag(k))
        self.freq = self.freq_tang

    def _mtf_units_tang(self, k: int) -> float:
        """Tangential frequency step with the chief-ray image-plane
        correction df_chief * FNO_on/FNO_off (reference
        `mtf/fft.py:196-218`)."""
        df_chief = 1.0 / ((self.num_rays - 1) * self.wavelength * 1e-3
                          * self.FNO[k])
        return df_chief * (self._fno_on_axis / self.FNO[k])

    def _mtf_units_sag(self, k: int) -> float:
        """Sagittal frequency step: per-field working F/# directly
        (reference `mtf/fft.py:220-236`)."""
        return 1.0 / ((self.num_rays - 1) * self.wavelength * 1e-3
                      * self.FNO[k])

    def view(self, figsize=(10, 7)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        for i, field in enumerate(self.fields):
            t, s = self.mtf[i]
            sel = self.freq_tang[i] <= self.max_freq
            ax.plot(self.freq_tang[i][sel], np.asarray(t)[sel],
                    label=f"Hy={field[1]:.2f} T")
            sel = self.freq_sag[i] <= self.max_freq
            ax.plot(self.freq_sag[i][sel], np.asarray(s)[sel], "--",
                    label=f"Hy={field[1]:.2f} S")
        ax.set_xlabel("Spatial frequency (cycles/mm)")
        ax.set_ylabel("MTF")
        ax.set_ylim(0, 1)
        ax.legend()
        ax.grid(True)
        return fig, ax


class VectorialFFTMTF(ScalarFFTMTF):
    """Polarization-aware FFT MTF: the PSF comes from the 3-component
    exit-pupil E-field (reference `mtf/vectorial_fft.py`)."""

    _psf_cls = VectorialFFTPSF


class FFTMTF:
    """Factory (reference `mtf/fft.py:238-299`): vectorial MTF when the
    optic has a polarization state, scalar otherwise."""

    def __new__(cls, optic, *args, **kwargs):
        if getattr(optic, "polarization", "ignore") != "ignore":
            return VectorialFFTMTF(optic, *args, **kwargs)
        return ScalarFFTMTF(optic, *args, **kwargs)
