"""FFT point-spread function (scalar + vectorial).

Counterpart of the reference's `ScalarFFTPSF`/`VectorialFFTPSF`
(`psf/fft.py:42-290`, `psf/vectorial_fft.py:17`): sample
the wavefront on a square pupil grid, build the complex pupil
A exp(-i 2 pi OPD), zero-pad, fft2 — all XLA-native ops inside one jitted,
differentiable graph (FFTs batch over wavelengths via vmap rather than a
Python loop).

Normalization matches the reference: diffraction-limited peak = 100, so
`strehl_ratio()` is the centered peak / 100.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu import config
from optiland_tpu.core.resolve import resolve_wavelengths
from optiland_tpu.system import paraxial as px
from optiland_tpu.wavefront.core import wavefront_data


def calculate_grid_size(num_rays: int) -> tuple[int, int]:
    """OpticStudio-style FFT sampling emulation (reference `psf/fft.py:20`)."""
    eff = int(np.floor(32 * 2 ** ((np.log2(num_rays) - 5) / 2)))
    return eff, num_rays * 2


def _pupil_grid(static, params, Hx, Hy, wavelength, num_rays, strategy,
                aiming="paraxial"):
    """Complex pupil on a num_rays x num_rays grid (unit-disk masked)."""
    lin = jnp.linspace(-1.0, 1.0, num_rays)
    X, Y = jnp.meshgrid(lin, lin)
    Px, Py = X.ravel(), Y.ravel()
    inside = Px**2 + Py**2 <= 1.0

    data = wavefront_data(static, params, Hx, Hy, Px, Py, wavelength,
                          strategy=strategy, aiming=aiming)
    # phase in config.phase_dtype() so TPU builds c64 (no C128 on TPU)
    pdt = config.phase_dtype()
    amp = jnp.sqrt(data.intensity).astype(pdt)
    P = amp * jnp.exp(-config.imag_unit()
                      * (2.0 * jnp.pi * data.opd).astype(pdt))
    P = jnp.where(inside, P, 0.0)
    return P.reshape(num_rays, num_rays)


def _psf_from_pupils(pupils, grid_size):
    """Zero-pad + fft2 + |.|^2, normalized to DL peak = 100
    (reference `psf/fft.py:170-250`)."""
    n = pupils.shape[-1]
    pad_before = (grid_size - n) // 2
    pad_after = pad_before + (grid_size - n) % 2
    padded = jnp.pad(pupils, ((0, 0), (pad_before, pad_after),
                              (pad_before, pad_after)))
    amp = jnp.fft.fftshift(jnp.fft.fft2(padded), axes=(-2, -1))
    psf = jnp.sum(jnp.real(amp * jnp.conj(amp)), axis=0)
    norm = jnp.sum(jnp.abs(pupils[0]) > 0) ** 2
    return psf / norm * 100.0


class ScalarFFTPSF:
    """Scalar FFT PSF for one field over the configured wavelengths."""

    def __init__(self, optic, field, wavelength="primary", num_rays: int = 128,
                 grid_size: int | None = None, strategy: str = "chief_ray"):
        self.optic = optic
        self.field = field
        self.wavelengths = resolve_wavelengths(optic, wavelength)
        if grid_size is None:
            if num_rays < 32:
                raise ValueError(
                    "num_rays must be at least 32 if grid_size is not specified."
                )
            num_rays, grid_size = calculate_grid_size(num_rays)
        elif grid_size < num_rays:
            raise ValueError("grid_size must be >= num_rays")
        self.num_rays = num_rays
        self.grid_size = grid_size
        self.strategy = strategy

        static, params = optic.build()
        aiming = getattr(optic, "ray_aiming", "paraxial")

        @jax.jit
        def compute(params, wls):
            pupils = jax.vmap(
                lambda w: _pupil_grid(static, params, field[0], field[1], w,
                                      num_rays, strategy, aiming)
            )(wls)
            return pupils, _psf_from_pupils(pupils, grid_size)

        wls = jnp.asarray(self.wavelengths, params.cv.dtype)
        self.pupils, self.psf = compute(params, wls)

    def strehl_ratio(self):
        c = self.psf.shape[0] // 2
        return self.psf[c, c] / 100.0

    def _psf_extent_um(self):
        """Physical PSF extent (reference `psf/fft.py:255-283`)."""
        static, params = self.optic.build()
        fno = float(px.FNO(static, params, self.wavelengths[0]))
        # working FNO correction for finite conjugates is handled upstream
        Q = self.grid_size / (self.num_rays - 1)
        dx = self.wavelengths[0] * fno / Q
        return self.psf.shape[1] * dx, self.psf.shape[0] * dx

    def view(self, projection: str = "2d", log: bool = False, figsize=(7, 5.5),
             threshold: float = 0.05):
        import matplotlib.pyplot as plt

        psf = np.asarray(self.psf)
        # crop to the interesting center region
        n = psf.shape[0]
        peak = psf.max()
        rows = np.where(psf.max(axis=1) > peak * threshold)[0]
        half = max(abs(rows.min() - n // 2), abs(rows.max() - n // 2), 16)
        lo, hi = n // 2 - half, n // 2 + half
        img = psf[lo:hi, lo:hi]
        w, h = self._psf_extent_um()
        w *= img.shape[1] / n
        h *= img.shape[0] / n
        fig, ax = plt.subplots(figsize=figsize)
        data = np.log10(np.maximum(img, 1e-9)) if log else img
        im = ax.imshow(data, extent=(-w / 2, w / 2, -h / 2, h / 2),
                       origin="lower")
        ax.set_xlabel("Image X (um)")
        ax.set_ylabel("Image Y (um)")
        fig.colorbar(im, ax=ax)
        return fig, ax


def _vector_pupils(static, params, Hx, Hy, wavelength, num_rays, strategy,
                   state, aiming="paraxial"):
    """Component pupils for one wavelength: (n_states*3, n, n) complex
    (reference `psf/vectorial_fft.py:25-66`)."""
    lin = jnp.linspace(-1.0, 1.0, num_rays)
    X, Y = jnp.meshgrid(lin, lin)
    Px, Py = X.ravel(), Y.ravel()
    inside = Px**2 + Py**2 <= 1.0

    data = wavefront_data(static, params, Hx, Hy, Px, Py, wavelength,
                          strategy=strategy, polarization=state,
                          aiming=aiming)
    valid = data.intensity > 0
    pdt = config.phase_dtype()
    phase = jnp.exp(-config.imag_unit()
                    * (2.0 * jnp.pi * data.opd).astype(pdt))
    pupils = []
    for s in range(data.E_exits.shape[0]):
        for c in range(3):
            amp = jnp.where(valid, data.E_exits[s, :, c], 0.0)
            P = jnp.where(inside, amp * phase, 0.0)
            pupils.append(P.reshape(num_rays, num_rays))
    return jnp.stack(pupils)


def _psf_from_vector_pupils(pupils, grid_size):
    """Incoherent sum of per-component FFT intensities; DL peak = 100 via
    sum_i (sum |P_i|)^2 (reference `psf/vectorial_fft.py:68-82`)."""
    n = pupils.shape[-1]
    pad_before = (grid_size - n) // 2
    pad_after = pad_before + (grid_size - n) % 2
    padded = jnp.pad(pupils, ((0, 0), (pad_before, pad_after),
                              (pad_before, pad_after)))
    amp = jnp.fft.fftshift(jnp.fft.fft2(padded), axes=(-2, -1))
    psf = jnp.sum(jnp.real(amp * jnp.conj(amp)), axis=0)
    norm = jnp.sum(jnp.sum(jnp.abs(pupils), axis=(-2, -1)) ** 2)
    return psf / norm * 100.0


class VectorialFFTPSF:
    """Vectorial FFT PSF: FFT of each Cartesian exit-pupil E-field component,
    summed incoherently over components and polarization states."""

    def __init__(self, optic, field, wavelength="primary",
                 num_rays: int = 128, grid_size: int | None = None,
                 strategy: str = "chief_ray"):
        from optiland_tpu.polarization import PolarizationState

        state = optic.polarization
        if state == "ignore" or state is None:
            state = PolarizationState.unpolarized()
        self.optic = optic
        self.field = field
        self.wavelengths = resolve_wavelengths(optic, wavelength)
        if grid_size is None:
            if num_rays < 32:
                raise ValueError(
                    "num_rays must be at least 32 if grid_size is not "
                    "specified.")
            num_rays, grid_size = calculate_grid_size(num_rays)
        elif grid_size < num_rays:
            raise ValueError("grid_size must be >= num_rays")
        self.num_rays = num_rays
        self.grid_size = grid_size
        self.strategy = strategy

        static, params = optic.build()
        aiming = getattr(optic, "ray_aiming", "paraxial")

        @jax.jit
        def compute(params, wls):
            pupils = jax.vmap(
                lambda w: _vector_pupils(static, params, field[0], field[1],
                                         w, num_rays, strategy, state,
                                         aiming)
            )(wls)
            pupils = pupils.reshape((-1,) + pupils.shape[-2:])
            return pupils, _psf_from_vector_pupils(pupils, grid_size)

        wls = jnp.asarray(self.wavelengths, params.cv.dtype)
        self.pupils, self.psf = compute(params, wls)

    strehl_ratio = ScalarFFTPSF.strehl_ratio
    _psf_extent_um = ScalarFFTPSF._psf_extent_um
    view = ScalarFFTPSF.view


class FFTPSF:
    """Factory: scalar FFT PSF for scalar traces, vectorial when the optic
    has a polarization state set (reference `psf/fft.py:290-330`)."""

    def __new__(cls, optic, *args, **kwargs):
        if getattr(optic, "polarization", "ignore") != "ignore":
            return VectorialFFTPSF(optic, *args, **kwargs)
        return ScalarFFTPSF(optic, *args, **kwargs)
