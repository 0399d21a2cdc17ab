"""Field curvature via parabasal ray pairs (reference
`analysis/field_curvature.py:112-200`)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_wavelengths


class FieldCurvature:
    """Tangential/sagittal focal shift vs field.

    data[k] = (tangential, sagittal) arrays of z-intersections relative to
    the image plane, one pair per wavelength.
    """

    def __init__(self, optic, wavelengths="all", num_points: int = 128,
                 delta: float = 1e-5):
        self.optic = optic
        self.wavelengths = resolve_wavelengths(optic, wavelengths)
        self.num_points = num_points

        n = num_points
        Hy = jnp.repeat(jnp.linspace(0.0, 1.0, n), 2)
        Hx = jnp.zeros(2 * n)
        pm = jnp.tile(jnp.asarray([-delta, delta]), n)
        zero = jnp.zeros(2 * n)

        self.data = []
        for w in self.wavelengths:
            # tangential: parabasal pair split in Py
            ht = optic.trace_generic(Hx, Hy, zero, pm, wavelength=w)
            M1, N1 = ht.M[-1, ::2], ht.N[-1, ::2]
            M2, N2 = ht.M[-1, 1::2], ht.N[-1, 1::2]
            y01, z01 = ht.y[-1, ::2], ht.z[-1, ::2]
            y02, z02 = ht.y[-1, 1::2], ht.z[-1, 1::2]
            t1 = (M2 * z01 - M2 * z02 - N2 * y01 + N2 * y02) / (
                M1 * N2 - M2 * N1
            )
            tangential = t1 * N1

            # sagittal: pair split in Px
            hs = optic.trace_generic(Hx, Hy, pm, zero, wavelength=w)
            L1, N1s = hs.L[-1, ::2], hs.N[-1, ::2]
            L2, N2s = hs.L[-1, 1::2], hs.N[-1, 1::2]
            x01, z01s = hs.x[-1, ::2], hs.z[-1, ::2]
            x02, z02s = hs.x[-1, 1::2], hs.z[-1, 1::2]
            t1s = (L2 * z01s - L2 * z02s - N2s * x01 + N2s * x02) / (
                L1 * N2s - L2 * N1s
            )
            sagittal = t1s * N1s

            self.data.append((tangential, sagittal))

    def view(self, figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        field = np.linspace(0, self.optic.fields.max_field, self.num_points)
        for k, w in enumerate(self.wavelengths):
            t, s = self.data[k]
            ax.plot(np.asarray(t), field, label=f"T {w:.4f} um")
            ax.plot(np.asarray(s), field, "--", label=f"S {w:.4f} um")
        ax.axvline(0, color="k", lw=1)
        ax.set_xlabel("Focal shift (mm)")
        ax.set_ylabel("Field")
        ax.legend()
        ax.grid(True)
        return fig, ax
