"""Huygens-Fresnel direct-summation PSF.

The reference's only O(N^2) loop: for every image pixel, sum complex phasors
from every pupil sample (`psf/huygens_fresnel.py:31-417`; Numba kernel at
`huygens_fresnel_strategies.py:64-174`, the "native" component per SURVEY.md
§2.16). Here it is a Pallas TPU kernel tiling (image-pixels x pupil-rays)
through VMEM with in-register accumulation over the pupil axis, plus a
pure-XLA fallback used on CPU and as the kernel's parity oracle.

Physics identical to the reference: spherical kernel exp(ikR)/R, obliquity
(1 + cos theta)/2 with the pupil-sphere normal approximated as Q/Rp, pupil
phase exp(-ik OPD).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.core.resolve import resolve_wavelengths
from optiland_tpu.core import distributions as dist
from optiland_tpu.system import paraxial as px
from optiland_tpu.wavefront.core import wavefront_data


def _field_contrib(ix, iy, iz, ux, uy, uz, amp, opd, k, Rp):
    """Field at image points (broadcast (I, P)) from pupil samples."""
    dx = ix - ux
    dy = iy - uy
    dz = iz - uz
    R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    cos_theta = (dx * ux + dy * uy + dz * uz) / (R * Rp)
    obliq = 0.5 * (1.0 + cos_theta)
    # exp(ik(R - opd)) / R * amp * obliq, accumulated over pupil axis.
    # Phase is referenced to the pupil sphere radius: k*(R - Rp) differs from
    # k*R by a constant phase that cancels in |field|^2, and keeps the cos/sin
    # argument small enough for f32 on TPU (k*R itself is ~1e6 radians).
    phase = k * ((R - Rp) - opd)
    scale = amp * obliq / R
    re = jnp.sum(scale * jnp.cos(phase), axis=-1)
    im = jnp.sum(scale * jnp.sin(phase), axis=-1)
    return re, im


def huygens_sum_xla(image_xyz, pupil_xyz, pupil_amp, pupil_opd, wavelength_mm,
                    Rp, row_chunk: int = 128):
    """Pure-XLA summation: lax.map over image-row chunks to bound memory."""
    ix, iy, iz = (a.ravel() for a in image_xyz)
    ux, uy, uz = pupil_xyz
    k = 2.0 * jnp.pi / wavelength_mm
    n = ix.shape[0]
    pad = (-n) % row_chunk
    ixp = jnp.pad(ix, (0, pad))
    iyp = jnp.pad(iy, (0, pad))
    izp = jnp.pad(iz, (0, pad))
    chunks = ixp.shape[0] // row_chunk

    def body(c):
        cx, cy, cz = c
        re, im = _field_contrib(
            cx[:, None], cy[:, None], cz[:, None],
            ux[None, :], uy[None, :], uz[None, :],
            pupil_amp[None, :], pupil_opd[None, :], k, Rp,
        )
        return re * re + im * im

    psf = jax.lax.map(
        body,
        (ixp.reshape(chunks, row_chunk), iyp.reshape(chunks, row_chunk),
         izp.reshape(chunks, row_chunk)),
    ).ravel()[:n]
    return psf.reshape(image_xyz[0].shape)


def _huygens_kernel(img_ref, pup_ref, scal_ref, out_ref):
    """Pallas kernel: one (image-tile, pupil-tile) block per program.

    img_ref: (3, TI)    image x/y/z for this tile
    pup_ref: (5, TP)    pupil x/y/z/amp/opd for this tile
    scal_ref: (1, 2)    [k, Rp] in SMEM
    out_ref: (2, TI)    (re, im) field — accumulated over the pupil grid
                        axis, which TPU executes sequentially
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    k = scal_ref[0, 0]
    Rp = scal_ref[0, 1]
    ix = img_ref[0, :][:, None]
    iy = img_ref[1, :][:, None]
    iz = img_ref[2, :][:, None]
    ux = pup_ref[0, :][None, :]
    uy = pup_ref[1, :][None, :]
    uz = pup_ref[2, :][None, :]
    amp = pup_ref[3, :][None, :]
    opd = pup_ref[4, :][None, :]

    dx = ix - ux
    dy = iy - uy
    dz = iz - uz
    R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    cos_theta = (dx * ux + dy * uy + dz * uz) / (R * Rp)
    scale = amp * 0.5 * (1.0 + cos_theta) / R
    # Rp-referenced phase: constant offset vs the reference formula, cancels
    # in |field|^2; keeps the argument f32-safe (see _field_contrib)
    phase = k * ((R - Rp) - opd)
    re = jnp.sum(scale * jnp.cos(phase), axis=-1)
    im = jnp.sum(scale * jnp.sin(phase), axis=-1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = re
        out_ref[1, :] = im

    @pl.when(j > 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + re
        out_ref[1, :] = out_ref[1, :] + im


@partial(jax.jit, static_argnames=("tile_i", "tile_p", "interpret"))
def huygens_sum_pallas(image_xyz, pupil_xyz, pupil_amp, pupil_opd,
                       wavelength_mm, Rp, tile_i: int = 512,
                       tile_p: int = 512, interpret: bool = False):
    """Pallas-tiled Huygens summation (TPU path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.result_type(image_xyz[0].dtype, pupil_xyz[0].dtype)
    ix, iy, iz = (a.ravel().astype(dtype) for a in image_xyz)
    n = ix.shape[0]
    pad_i = (-n) % tile_i
    img = jnp.stack([jnp.pad(a, (0, pad_i)) for a in (ix, iy, iz)])

    ux, uy, uz = (a.astype(dtype) for a in pupil_xyz)
    m = ux.shape[0]
    pad_p = (-m) % tile_p
    pup = jnp.stack([
        jnp.pad(ux, (0, pad_p)),
        jnp.pad(uy, (0, pad_p), constant_values=0.0),
        jnp.pad(uz, (0, pad_p), constant_values=1.0),  # avoid R=0 at pad
        jnp.pad(pupil_amp.astype(dtype), (0, pad_p)),  # amp=0 pad
        jnp.pad(pupil_opd.astype(dtype), (0, pad_p)),
    ])
    scal = jnp.asarray(
        [[2.0 * np.pi / wavelength_mm, 1.0]], dtype
    ).at[0, 1].set(jnp.asarray(Rp, dtype))

    ni = img.shape[1] // tile_i
    nj = pup.shape[1] // tile_p

    # NOTE: index maps return explicit jnp.int32 — under jax_enable_x64
    # Pallas's Python-int zeros trace as i64 and Mosaic cannot legalize the
    # resulting `func.return (i64)` (same fix as trace/fused.py:_full_spec)
    out = pl.pallas_call(
        _huygens_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((3, tile_i), lambda i, j: (jnp.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, tile_p), lambda i, j: (jnp.int32(0), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2),
                         lambda i, j: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, tile_i), lambda i, j: (jnp.int32(0), i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, img.shape[1]), dtype),
        interpret=interpret,
    )(img, pup, scal)

    re, im = out[0, :n], out[1, :n]
    return (re * re + im * im).reshape(image_xyz[0].shape)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class ScalarHuygensPSF:
    """Scalar Huygens-Fresnel PSF for one field and wavelength."""

    def __init__(self, optic, field, wavelength="primary", num_rays: int = 128,
                 image_size: int = 128, strategy: str = "chief_ray",
                 use_pallas: bool | None = None):
        self.optic = optic
        self.field = field
        self.wavelength = (
            optic.primary_wavelength if wavelength == "primary" else float(wavelength)
        )
        self.num_rays = num_rays
        self.image_size = image_size
        if use_pallas is None:
            use_pallas = _on_tpu()
        self._use_pallas = use_pallas

        static, params = optic.build()
        wl = jnp.asarray(self.wavelength, params.cv.dtype)

        # pupil samples on a uniform disk grid
        lin = jnp.linspace(-1.0, 1.0, num_rays)
        X, Y = jnp.meshgrid(lin, lin)
        inside = (X**2 + Y**2 <= 1.0).ravel()
        Px, Py = X.ravel(), Y.ravel()

        aiming = getattr(optic, "ray_aiming", "paraxial")
        data = jax.jit(wavefront_data, static_argnums=(0,),
                       static_argnames=("strategy", "aiming"))(
            static, params, field[0], field[1], Px, Py, wl, strategy=strategy,
            aiming=aiming)
        amp = jnp.sqrt(data.intensity) * inside
        opd_mm = data.opd * self.wavelength * 1e-3

        # image grid centered on the beam footprint
        spot = optic.trace(Hx=field[0], Hy=field[1], wavelength=self.wavelength,
                           num_rays=6, distribution="hexapolar")
        sx, sy, si = spot.x[-1], spot.y[-1], spot.intensity[-1]
        wsum = jnp.sum(si) + 1e-12
        cx = jnp.sum(sx * si) / wsum
        cy = jnp.sum(sy * si) / wsum
        fno = px.FNO(static, params, self.wavelength)
        extent_geo = jnp.max(
            jnp.where(si > 0, jnp.hypot(sx - cx, sy - cy), 0.0)
        )
        extent_ideal = 5.0 * fno * 1.22 * self.wavelength * 1e-3
        extent = jnp.maximum(extent_geo, extent_ideal)
        self.pixel_pitch = 2.0 * extent / image_size
        gx = jnp.linspace(-1.0, 1.0, image_size) * extent
        IX, IY = jnp.meshgrid(gx + cx, gx + cy)
        from optiland_tpu.system.spec import positions_of

        pos = positions_of(static, params)
        IZ = jnp.full_like(IX, pos[-1])
        self.cx, self.cy = cx, cy

        summation = huygens_sum_pallas if use_pallas else huygens_sum_xla
        wl_mm = self.wavelength * 1e-3

        psf_raw = summation((IX, IY, IZ), (data.pupil_x, data.pupil_y,
                                           data.pupil_z),
                            amp, opd_mm, wl_mm, data.radius)

        # normalization: ideal (zero-OPD) on-axis peak -> 100
        zero = jnp.zeros((1, 1), psf_raw.dtype)
        izc = jnp.full((1, 1), pos[-1], psf_raw.dtype)
        if field == (0, 0):
            ideal_data = data
        else:
            ideal_data = jax.jit(wavefront_data, static_argnums=(0,),
                                 static_argnames=("strategy", "aiming"))(
                static, params, 0.0, 0.0, Px, Py, wl, strategy=strategy,
                aiming=aiming)
        ideal_amp = jnp.ones_like(ideal_data.intensity) * inside
        peak = huygens_sum_xla((zero, zero, izc),
                               (ideal_data.pupil_x, ideal_data.pupil_y,
                                ideal_data.pupil_z),
                               ideal_amp, jnp.zeros_like(opd_mm), wl_mm,
                               ideal_data.radius)
        self.psf = psf_raw / peak[0, 0] * 100.0

    def strehl_ratio(self):
        c = self.image_size // 2
        return self.psf[c, c] / 100.0

    def view(self, log: bool = False, figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        img = np.asarray(self.psf)
        half = float(self.pixel_pitch) * self.image_size / 2 * 1e3
        fig, ax = plt.subplots(figsize=figsize)
        data = np.log10(np.maximum(img, 1e-9)) if log else img
        im = ax.imshow(data, extent=(-half, half, -half, half), origin="lower")
        ax.set_xlabel("Image X (um)")
        ax.set_ylabel("Image Y (um)")
        fig.colorbar(im, ax=ax)
        return fig, ax


def huygens_sum_complex_xla(image_xyz, pupil_xyz, amp_re, amp_im, pupil_opd,
                            wavelength_mm, Rp, row_chunk: int = 128):
    """Huygens summation with a *complex* pupil amplitude (vectorial E-field
    component): |sum amp * e^{ik(R-Rp-opd)} obliq / R|^2 per image point."""
    ix, iy, iz = (a.ravel() for a in image_xyz)
    ux, uy, uz = pupil_xyz
    k = 2.0 * jnp.pi / wavelength_mm
    n = ix.shape[0]
    pad = (-n) % row_chunk
    ixp = jnp.pad(ix, (0, pad))
    iyp = jnp.pad(iy, (0, pad))
    izp = jnp.pad(iz, (0, pad))
    chunks = ixp.shape[0] // row_chunk

    def body(c):
        cx, cy, cz = c
        dx = cx[:, None] - ux[None, :]
        dy = cy[:, None] - uy[None, :]
        dz = cz[:, None] - uz[None, :]
        R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cos_theta = (dx * ux[None, :] + dy * uy[None, :]
                     + dz * uz[None, :]) / (R * Rp)
        obliq = 0.5 * (1.0 + cos_theta)
        phase = k * ((R - Rp) - pupil_opd[None, :])
        scale = obliq / R
        cp = jnp.cos(phase)
        sp = jnp.sin(phase)
        re = jnp.sum(scale * (amp_re[None, :] * cp - amp_im[None, :] * sp),
                     axis=-1)
        im = jnp.sum(scale * (amp_re[None, :] * sp + amp_im[None, :] * cp),
                     axis=-1)
        return re * re + im * im

    psf = jax.lax.map(
        body,
        (ixp.reshape(chunks, row_chunk), iyp.reshape(chunks, row_chunk),
         izp.reshape(chunks, row_chunk)),
    ).ravel()[:n]
    return psf.reshape(image_xyz[0].shape)


class VectorialHuygensPSF:
    """Vectorial Huygens-Fresnel PSF: the diffraction integral evaluated for
    each Cartesian exit-pupil E-field component of each incoherent
    polarization state, intensities summed (reference
    `psf/vectorial_huygens.py:21`)."""

    def __init__(self, optic, field, wavelength="primary",
                 num_rays: int = 128, image_size: int = 128,
                 strategy: str = "chief_ray"):
        from optiland_tpu.polarization import PolarizationState

        state = optic.polarization
        if state == "ignore" or state is None:
            state = PolarizationState.unpolarized()
        self.optic = optic
        self.field = field
        self.wavelength = (
            optic.primary_wavelength if wavelength == "primary"
            else float(wavelength))
        self.num_rays = num_rays
        self.image_size = image_size

        static, params = optic.build()
        wl = jnp.asarray(self.wavelength, params.cv.dtype)

        lin = jnp.linspace(-1.0, 1.0, num_rays)
        X, Y = jnp.meshgrid(lin, lin)
        inside = (X**2 + Y**2 <= 1.0).ravel()
        Px, Py = X.ravel(), Y.ravel()

        data = wavefront_data(static, params, field[0], field[1], Px, Py, wl,
                              strategy=strategy, polarization=state,
                              aiming=getattr(optic, "ray_aiming", "paraxial"))
        valid = (data.intensity > 0) & inside
        opd_mm = data.opd * self.wavelength * 1e-3

        # image grid centered on the beam footprint (same rule as scalar)
        spot = optic.trace(Hx=field[0], Hy=field[1],
                           wavelength=self.wavelength, num_rays=6,
                           distribution="hexapolar")
        sx, sy, si = spot.x[-1], spot.y[-1], spot.intensity[-1]
        wsum = jnp.sum(si) + 1e-12
        cx = jnp.sum(sx * si) / wsum
        cy = jnp.sum(sy * si) / wsum
        fno = px.FNO(static, params, self.wavelength)
        extent_geo = jnp.max(
            jnp.where(si > 0, jnp.hypot(sx - cx, sy - cy), 0.0))
        extent_ideal = 5.0 * fno * 1.22 * self.wavelength * 1e-3
        extent = jnp.maximum(extent_geo, extent_ideal)
        self.pixel_pitch = 2.0 * extent / image_size
        gx = jnp.linspace(-1.0, 1.0, image_size) * extent
        IX, IY = jnp.meshgrid(gx + cx, gx + cy)
        from optiland_tpu.system.spec import positions_of

        pos = positions_of(static, params)
        IZ = jnp.full_like(IX, pos[-1])
        self.cx, self.cy = cx, cy
        wl_mm = self.wavelength * 1e-3

        def component_sum(E_exits, image, opd):
            total = 0.0
            for s in range(E_exits.shape[0]):
                for c in range(3):
                    amp = jnp.where(valid, E_exits[s, :, c], 0.0)
                    total = total + huygens_sum_complex_xla(
                        image, (data.pupil_x, data.pupil_y, data.pupil_z),
                        jnp.real(amp), jnp.imag(amp), opd, wl_mm, data.radius)
            return total

        psf_raw = component_sum(data.E_exits, (IX, IY, IZ), opd_mm)

        # ideal (zero-OPD) on-axis peak -> 100 (reference
        # `vectorial_huygens.py:117-168`)
        zero = jnp.zeros((1, 1), psf_raw.dtype)
        izc = jnp.full((1, 1), pos[-1], psf_raw.dtype)
        if tuple(field) == (0, 0):
            ideal = data
        else:
            ideal = wavefront_data(static, params, 0.0, 0.0, Px, Py, wl,
                                   strategy=strategy, polarization=state)
        ideal_valid = (ideal.intensity > 0) & inside
        peak = 0.0
        for s in range(ideal.E_exits.shape[0]):
            for c in range(3):
                amp = jnp.where(ideal_valid, ideal.E_exits[s, :, c], 0.0)
                peak = peak + huygens_sum_complex_xla(
                    (zero, zero, izc),
                    (ideal.pupil_x, ideal.pupil_y, ideal.pupil_z),
                    jnp.real(amp), jnp.imag(amp),
                    jnp.zeros_like(opd_mm), wl_mm, ideal.radius)
        self.psf = psf_raw / peak[0, 0] * 100.0

    strehl_ratio = ScalarHuygensPSF.strehl_ratio
    view = ScalarHuygensPSF.view


class HuygensPSF:
    """Factory: scalar or vectorial Huygens PSF by the optic's polarization
    state (mirrors the reference `psf/huygens_fresnel.py` factory pattern)."""

    def __new__(cls, optic, *args, **kwargs):
        if getattr(optic, "polarization", "ignore") != "ignore":
            kwargs.pop("use_pallas", None)
            return VectorialHuygensPSF(optic, *args, **kwargs)
        return ScalarHuygensPSF(optic, *args, **kwargs)
