"""MTF vs field (reference `analysis/mtf_vs_field.py`): tangential and
sagittal geometric MTF at chosen spatial frequencies swept over field
height, all from one batched trace."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.core import distributions as dist


class MTFvsField:
    def __init__(self, optic, freqs=(10.0, 30.0), num_fields: int = 16,
                 wavelength="primary", num_rays: int = 64,
                 distribution: str = "uniform"):
        from optiland_tpu.mtf.geometric import _lsf_mtf

        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.freqs = list(freqs)
        self.num_fields = num_fields

        out = dist.generate(distribution, num_rays)
        Px, Py = np.asarray(out[0]), np.asarray(out[1])
        P = Px.shape[0]
        hys = np.linspace(0.0, 1.0, num_fields)
        Hx = np.zeros(num_fields * P)
        Hy = np.repeat(hys, P)
        hist = optic.trace_generic(Hx, Hy, np.tile(Px, num_fields),
                                   np.tile(Py, num_fields),
                                   wavelength=wavelength)
        x = hist.x[-1].reshape(num_fields, P)
        y = hist.y[-1].reshape(num_fields, P)
        m = (hist.intensity[-1] > 0).astype(x.dtype).reshape(num_fields, P)

        fr = jnp.asarray(self.freqs)
        tan = np.zeros((num_fields, len(self.freqs)))
        sag = np.zeros((num_fields, len(self.freqs)))
        for fi in range(num_fields):
            tan[fi] = np.asarray(_lsf_mtf(y[fi], m[fi], fr, 128))
            sag[fi] = np.asarray(_lsf_mtf(x[fi], m[fi], fr, 128))
        self.fields_hy = hys
        self.data = {"tangential": tan, "sagittal": sag}

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        hy = self.fields_hy * self.optic.fields.max_field
        for j, f in enumerate(self.freqs):
            ax.plot(hy, self.data["tangential"][:, j],
                    label=f"{f:g} cyc/mm T")
            ax.plot(hy, self.data["sagittal"][:, j], "--",
                    label=f"{f:g} cyc/mm S")
        ax.set_xlabel("Field")
        ax.set_ylabel("MTF")
        ax.set_ylim(0, 1)
        ax.legend()
        ax.grid(True)
        return fig, ax
