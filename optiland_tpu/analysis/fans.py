"""Transverse ray-aberration fans (reference `analysis/ray_fan.py:20-290`)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_fields, resolve_wavelengths


class RayFan:
    """Ex(Px) and Ey(Py) fans per field/wavelength, centered on the P=0 ray.

    One batched trace covers fields x wavelengths x (x-fan + y-fan).
    """

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_points: int = 256):
        self.optic = optic
        self.fields = resolve_fields(optic, fields)
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        if num_points % 2 == 0:
            num_points += 1  # force a sample at P = 0 (reference behavior)
        self.num_points = num_points

        F, W, P = len(self.fields), len(self.wavelengths), num_points
        p = np.linspace(-1.0, 1.0, P)
        zeros = np.zeros(P)
        # layout per (field, wavelength): [x-fan | y-fan]
        Px1 = np.concatenate([p, zeros])
        Py1 = np.concatenate([zeros, p])
        Hx = np.repeat([f[0] for f in self.fields], W * 2 * P)
        Hy = np.repeat([f[1] for f in self.fields], W * 2 * P)
        wl = np.tile(np.repeat(self.wavelengths, 2 * P), F)
        Pxs = np.tile(Px1, F * W)
        Pys = np.tile(Py1, F * W)

        static, params = optic.build()
        from optiland_tpu.system.optic import _jit_trace

        hist = _jit_trace(static)(
            params,
            jnp.asarray(Hx, params.cv.dtype), jnp.asarray(Hy, params.cv.dtype),
            jnp.asarray(Pxs, params.cv.dtype), jnp.asarray(Pys, params.cv.dtype),
            jnp.asarray(wl, params.cv.dtype), True,
        )
        x = hist.x[-1].reshape(F, W, 2, P)
        y = hist.y[-1].reshape(F, W, 2, P)
        i = hist.intensity[-1].reshape(F, W, 2, P)

        self.Px = self.Py = p
        off_x, off_y = self._reference_offsets(x, y, i, P)
        ex = x[:, :, 0, :] - off_x[:, None, None]
        ey = y[:, :, 1, :] - off_y[:, None, None]
        self.data = {
            "Px": p, "Py": p,
            "ex": ex, "ey": ey,
            "intensity_x": i[:, :, 0, :], "intensity_y": i[:, :, 1, :],
        }

    def _reference_offsets(self, x, y, i, P):
        """Per-field (off_x, off_y) the fans are centered on: the PRIMARY
        wavelength's P=0 ray (reference `_remove_distortion`,
        `ray_fan.py:161-204`); falls back to the masked fan mean when the
        central ray is vignetted.  `BestFitRayFan` overrides this."""
        prim = self.optic.primary_wavelength
        ref_j = (self.wavelengths.index(prim)
                 if prim in self.wavelengths else 0)
        c = P // 2

        def _offset(v, inten):
            center_ok = inten[:, ref_j, c] > 0
            mask = (inten[:, ref_j, :] > 0).astype(v.dtype)
            mean = jnp.sum(v[:, ref_j, :] * mask, axis=-1) / jnp.maximum(
                jnp.sum(mask, axis=-1), 1.0
            )
            return jnp.where(center_ok, v[:, ref_j, c], mean)

        return _offset(x[:, :, 0], i[:, :, 0]), _offset(y[:, :, 1],
                                                        i[:, :, 1])

    def view(self, figsize=(10, 3.33)):
        import matplotlib.pyplot as plt

        F = len(self.fields)
        fig, axs = plt.subplots(F, 2, figsize=(figsize[0], figsize[1] * F),
                                sharex=True, sharey=True, squeeze=False)
        for k, field in enumerate(self.fields):
            for j, w in enumerate(self.wavelengths):
                ey = np.where(np.asarray(self.data["intensity_y"][k, j]) > 0,
                              np.asarray(self.data["ey"][k, j]), np.nan)
                ex = np.where(np.asarray(self.data["intensity_x"][k, j]) > 0,
                              np.asarray(self.data["ex"][k, j]), np.nan)
                axs[k, 0].plot(self.Py, ey, label=f"{w:.4f} um")
                axs[k, 1].plot(self.Px, ex)
            axs[k, 0].set_title(f"Hy={field[1]:.2f} tangential")
            axs[k, 1].set_title(f"Hx={field[0]:.2f} sagittal")
            axs[k, 0].grid(True)
            axs[k, 1].grid(True)
        axs[0, 0].legend()
        fig.tight_layout()
        return fig, axs


class BestFitRayFan(RayFan):
    """Ray fan referenced to the best-fit sphere center instead of the
    chief ray (reference `analysis/ray_fan.py:247-340`): for each field, a
    2-D pupil trace at the primary wavelength is fit with the LSQ reference
    sphere (`wavefront.core` strategy "best_fit") and the fan origin is the
    sphere center's lateral (x, y). No per-wavelength recentering — the
    plot shows all aberrations (including distortion) relative to the
    optimal focus."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_points: int = 256, num_rays_for_fit: int = 15):
        self.num_rays_for_fit = num_rays_for_fit
        super().__init__(optic, fields, wavelengths, num_points)

    def _reference_offsets(self, x, y, i, P):
        from optiland_tpu.core.distributions import generate
        from optiland_tpu.wavefront.core import wavefront_data

        static, params = self.optic.build()
        Px, Py = generate("hexapolar", self.num_rays_for_fit)
        wl = self.optic.primary_wavelength
        aiming = getattr(self.optic, "ray_aiming", "paraxial")
        off_x, off_y = [], []
        for (Hx, Hy) in self.fields:
            data = wavefront_data(
                static, params, Hx, Hy,
                jnp.asarray(Px, params.cv.dtype),
                jnp.asarray(Py, params.cv.dtype),
                jnp.asarray(wl, params.cv.dtype),
                strategy="best_fit", aiming=aiming)
            off_x.append(data.center[0])
            off_y.append(data.center[1])
        return jnp.stack(off_x), jnp.stack(off_y)
