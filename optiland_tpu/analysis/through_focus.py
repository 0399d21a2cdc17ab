"""Through-focus analyses (reference `analysis/through_focus.py:15-95`,
`through_focus_spot_diagram.py`, `through_focus_mtf.py`).

Rather than mutating the image gap per step and re-tracing serially, all
focus steps evaluate from ONE trace: rays recorded at the last optical
surface are re-propagated to each shifted image plane inside the same jitted
graph.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.analysis.base import resolve_fields, resolve_wavelengths
from optiland_tpu.analysis.spot import _masked_mean
from optiland_tpu.core import distributions as dist


class ThroughFocusSpotDiagram:
    """RMS spot size at focal planes nominal + k*delta_focus.

    data: (num_steps, F, W) RMS radii about each plane's centroid.
    """

    MIN_STEPS, MAX_STEPS = 3, 7

    def __init__(self, optic, delta_focus: float = 0.1, num_steps: int = 5,
                 fields="all", wavelengths="all", num_rings: int = 6,
                 distribution: str = "hexapolar"):
        if num_steps % 2 == 0 or not (self.MIN_STEPS <= num_steps
                                      <= self.MAX_STEPS):
            raise ValueError(
                f"num_steps must be odd and within "
                f"[{self.MIN_STEPS}, {self.MAX_STEPS}]"
            )
        self.optic = optic
        self.delta_focus = delta_focus
        self.num_steps = num_steps
        self.fields = resolve_fields(optic, fields)
        self.wavelengths = resolve_wavelengths(optic, wavelengths)

        out = dist.generate(distribution, num_rings)
        Px, Py = np.asarray(out[0]), np.asarray(out[1])
        P = Px.shape[0]
        F, W = len(self.fields), len(self.wavelengths)
        Hx = np.repeat([f[0] for f in self.fields], W * P)
        Hy = np.repeat([f[1] for f in self.fields], W * P)
        wl = np.tile(np.repeat(self.wavelengths, P), F)
        Pxs = np.tile(Px, F * W)
        Pys = np.tile(Py, F * W)

        hist = optic.trace_generic(Hx, Hy, Pxs, Pys,
                                   wavelength=jnp.asarray(wl))
        # rays at the image plane; re-propagate by dz along ray directions
        x, y, z = hist.x[-1], hist.y[-1], hist.z[-1]
        L, M, N = hist.L[-1], hist.M[-1], hist.N[-1]
        inten = hist.intensity[-1]
        m = (inten > 0).astype(x.dtype)

        shifts = (np.arange(num_steps) - num_steps // 2) * delta_focus
        rows = []
        self.spots = []
        for dz in shifts:
            t = (dz) / N  # advance to plane z + dz
            xs = (x + t * L).reshape(F, W, P)
            ys = (y + t * M).reshape(F, W, P)
            mm = m.reshape(F, W, P)
            cx = _masked_mean(xs, mm, axis=-1)[..., None]
            cy = _masked_mean(ys, mm, axis=-1)[..., None]
            rms = jnp.sqrt(_masked_mean((xs - cx) ** 2 + (ys - cy) ** 2, mm,
                                        axis=-1))
            rows.append(rms)
            self.spots.append((xs, ys, mm))
        self.focus_shifts = shifts
        self.data = jnp.stack(rows)

    def rms_spot_radius(self):
        return self.data

    def view(self, figsize=(12, 3)):
        import matplotlib.pyplot as plt

        F = len(self.fields)
        fig, axs = plt.subplots(F, self.num_steps,
                                figsize=(figsize[0], figsize[1] * F),
                                squeeze=False)
        for si in range(self.num_steps):
            xs, ys, mm = self.spots[si]
            for fi in range(F):
                ax = axs[fi, si]
                for wi in range(len(self.wavelengths)):
                    sel = np.asarray(mm[fi, wi]) > 0
                    ax.scatter(np.asarray(xs[fi, wi])[sel],
                               np.asarray(ys[fi, wi])[sel], s=1)
                ax.set_title(f"dz={self.focus_shifts[si]:+.3f}", fontsize=7)
                ax.set_aspect("equal")
        fig.tight_layout()
        return fig, axs


class ThroughFocusMTF:
    """Geometric MTF at a single frequency vs focal shift (tangential and
    sagittal), per field (reference `analysis/through_focus_mtf.py`)."""

    def __init__(self, optic, freq: float, delta_focus: float = 0.05,
                 num_steps: int = 7, fields="all", wavelength="primary",
                 num_rays: int = 64, distribution: str = "uniform"):
        from optiland_tpu.mtf.geometric import _lsf_mtf

        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.freq = freq
        self.fields = resolve_fields(optic, fields)
        self.num_steps = num_steps
        self.delta_focus = delta_focus

        out = dist.generate(distribution, num_rays)
        Px, Py = np.asarray(out[0]), np.asarray(out[1])
        P = Px.shape[0]
        F = len(self.fields)
        Hx = np.repeat([f[0] for f in self.fields], P)
        Hy = np.repeat([f[1] for f in self.fields], P)
        hist = optic.trace_generic(Hx, Hy, np.tile(Px, F), np.tile(Py, F),
                                   wavelength=wavelength)
        x, y = hist.x[-1], hist.y[-1]
        L, M, N = hist.L[-1], hist.M[-1], hist.N[-1]
        m = (hist.intensity[-1] > 0).astype(x.dtype)

        shifts = (np.arange(num_steps) - num_steps // 2) * delta_focus
        freqs = jnp.asarray([freq])
        data = np.zeros((num_steps, F, 2))
        for si, dz in enumerate(shifts):
            t = dz / N
            xs = (x + t * L).reshape(F, P)
            ys = (y + t * M).reshape(F, P)
            mm = m.reshape(F, P)
            for fi in range(F):
                tan = _lsf_mtf(ys[fi], mm[fi], freqs, 128)[0]
                sag = _lsf_mtf(xs[fi], mm[fi], freqs, 128)[0]
                data[si, fi] = (float(tan), float(sag))
        self.focus_shifts = shifts
        self.data = data

    def view(self, figsize=(7, 4.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        for fi, field in enumerate(self.fields):
            ax.plot(self.focus_shifts, self.data[:, fi, 0],
                    label=f"Hy={field[1]:.2f} T")
            ax.plot(self.focus_shifts, self.data[:, fi, 1], "--",
                    label=f"Hy={field[1]:.2f} S")
        ax.set_xlabel("Focus shift (mm)")
        ax.set_ylabel(f"MTF @ {self.freq:g} cyc/mm")
        ax.legend()
        ax.grid(True)
        return fig, ax
