"""RMS spot size / RMS wavefront error vs field (reference
`analysis/rms_vs_field.py:26-200`)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.analysis.spot import SpotDiagram
from optiland_tpu.analysis.base import resolve_wavelengths
from optiland_tpu.core import distributions as dist
from optiland_tpu.wavefront.core import wavefront_data


class RmsSpotSizeVsField(SpotDiagram):
    """RMS spot size swept over field height (y scan, Hx = 0)."""

    def __init__(self, optic, num_fields: int = 32, wavelengths="all",
                 num_rings: int = 6, distribution: str = "hexapolar"):
        self.num_fields = num_fields
        fields = [(0.0, float(hy)) for hy in np.linspace(0, 1, num_fields)]
        super().__init__(optic, fields=fields, wavelengths=wavelengths,
                         num_rings=num_rings, distribution=distribution)
        self._spot_size = self.rms_spot_radius()  # (F, W)

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        hy = np.linspace(0, 1, self.num_fields) * self.optic.fields.max_field
        data = np.asarray(self._spot_size)
        for j, w in enumerate(self.wavelengths):
            ax.plot(hy, data[:, j], label=f"{w:.4f} um")
        ax.set_xlabel("Field")
        ax.set_ylabel("RMS spot size (mm)")
        ax.legend()
        ax.grid(True)
        return fig, ax


class RmsWavefrontErrorVsField:
    """RMS wavefront error (waves) swept over field height."""

    def __init__(self, optic, num_fields: int = 32, wavelengths="all",
                 num_rings: int = 15, strategy: str = "chief_ray"):
        self.optic = optic
        self.num_fields = num_fields
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        Px, Py = dist.hexapolar(num_rings)
        static, params = optic.build()
        hys = np.linspace(0, 1, num_fields)

        fn = jax.jit(wavefront_data, static_argnums=(0,),
                     static_argnames=("strategy", "aiming"))
        rows = []
        for hy in hys:
            cols = []
            for w in self.wavelengths:
                d = fn(static, params, 0.0, float(hy), Px, Py,
                       jnp.asarray(w, params.cv.dtype), strategy=strategy,
                       aiming=getattr(optic, "ray_aiming", "paraxial"))
                m = (d.intensity > 0).astype(d.opd.dtype)
                rms = jnp.sqrt(jnp.sum(d.opd**2 * m) /
                               jnp.maximum(jnp.sum(m), 1.0))
                cols.append(rms)
            rows.append(jnp.stack(cols))
        self._wavefront_error = jnp.stack(rows)  # (F, W)

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        hy = np.linspace(0, 1, self.num_fields) * self.optic.fields.max_field
        data = np.asarray(self._wavefront_error)
        for j, w in enumerate(self.wavelengths):
            ax.plot(hy, data[:, j], label=f"{w:.4f} um")
        ax.set_xlabel("Field")
        ax.set_ylabel("RMS wavefront error (waves)")
        ax.legend()
        ax.grid(True)
        return fig, ax
