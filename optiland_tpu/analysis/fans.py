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

        # center every wavelength on the PRIMARY wavelength's P=0 ray
        # (reference `_remove_distortion`, `ray_fan.py:161-204`); fall back to
        # the masked fan mean when the central ray is vignetted
        prim = optic.primary_wavelength
        ref_j = self.wavelengths.index(prim) if prim in self.wavelengths else 0
        c = P // 2
        self.Px = self.Py = p

        def _offset(v, inten):
            center_ok = inten[:, ref_j, c] > 0
            mask = (inten[:, ref_j, :] > 0).astype(v.dtype)
            mean = jnp.sum(v[:, ref_j, :] * mask, axis=-1) / jnp.maximum(
                jnp.sum(mask, axis=-1), 1.0
            )
            return jnp.where(center_ok, v[:, ref_j, c], mean)

        ex = x[:, :, 0, :] - _offset(x[:, :, 0], i[:, :, 0])[:, None, None]
        ey = y[:, :, 1, :] - _offset(y[:, :, 1], i[:, :, 1])[:, None, None]
        self.data = {
            "Px": p, "Py": p,
            "ex": ex, "ey": ey,
            "intensity_x": i[:, :, 0, :], "intensity_y": i[:, :, 1, :],
        }

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
