"""Jones pupil map (reference `analysis/jones_pupil.py:145-230`): the 2x2
Jones matrix of the full system across the exit-pupil grid, from a polarized
trace's PRT matrices projected into the dipole local basis."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_wavelengths
from optiland_tpu.polarization import PolarizationState
from optiland_tpu.trace.tracer import trace_system


class JonesPupil:
    def __init__(self, optic, field=(0, 0), wavelengths="all",
                 grid_size: int = 32):
        self.optic = optic
        self.field = field
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        self.grid_size = grid_size
        static, params = optic.build()

        lin = np.linspace(-1.0, 1.0, grid_size)
        PX, PY = np.meshgrid(lin, lin)
        Px, Py = PX.ravel(), PY.ravel()
        Hx = np.full_like(Px, field[0])
        Hy = np.full_like(Px, field[1])

        self.data = []
        for w in self.wavelengths:
            hist = trace_system(
                static, params, Hx, Hy, Px, Py,
                jnp.asarray(w, params.cv.dtype),
                polarization=PolarizationState(True, 1.0, 0.0, 0.0, 0.0),
            )
            k = jnp.stack([hist.L[-1], hist.M[-1], hist.N[-1]], axis=-1)
            k = k / jnp.linalg.norm(k, axis=-1, keepdims=True)
            x_axis = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), k.shape)
            v = jnp.cross(k, x_axis)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-15)
            u = jnp.cross(v, k)
            u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-15)

            P_x_in = hist.p[:, :, 0]
            P_y_in = hist.p[:, :, 1]
            uc = u.astype(hist.p.dtype)
            vc = v.astype(hist.p.dtype)
            Jxx = jnp.sum(uc * P_x_in, axis=-1)
            Jxy = jnp.sum(uc * P_y_in, axis=-1)
            Jyx = jnp.sum(vc * P_x_in, axis=-1)
            Jyy = jnp.sum(vc * P_y_in, axis=-1)
            J = jnp.stack([jnp.stack([Jxx, Jxy], axis=-1),
                           jnp.stack([Jyx, Jyy], axis=-1)], axis=-2)
            self.data.append({"Px": Px, "Py": Py, "J": J})

    def view(self, wavelength_index: int = 0, figsize=(9, 8)):
        import matplotlib.pyplot as plt

        d = self.data[wavelength_index]
        J = np.asarray(d["J"]).reshape(self.grid_size, self.grid_size, 2, 2)
        fig, axs = plt.subplots(2, 2, figsize=figsize)
        labels = [["|Jxx|", "|Jxy|"], ["|Jyx|", "|Jyy|"]]
        for i in range(2):
            for j in range(2):
                im = axs[i, j].imshow(np.abs(J[:, :, i, j]),
                                      extent=(-1, 1, -1, 1), origin="lower")
                axs[i, j].set_title(labels[i][j])
                fig.colorbar(im, ax=axs[i, j])
        fig.tight_layout()
        return fig, axs
