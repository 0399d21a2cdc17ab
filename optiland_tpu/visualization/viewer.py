"""2-D system visualization and info tables.

Counterpart of the reference's `visualization/system/optic_viewer.py` and
`visualization/info/lens_info_viewer.py`: matplotlib lens cross-section with
traced ray fans, and a tabular prescription report. (The reference's VTK 3-D
viewer and PySide6 GUI are host-only shells; a `draw3d` hook is stubbed until
a VTK-equivalent is warranted.)
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.geometry import surfaces as G
from optiland_tpu.system.spec import positions_of

# color themes (reference `visualization/themes.py` palettes)
THEMES = {
    "light": {"bg": "white", "fg": "black", "aperture": "#c62828"},
    "dark": {"bg": "#1e1e1e", "fg": "#e0e0e0", "aperture": "#ef5350"},
}


class OpticViewer:
    """Cross-section plot: surface profiles, ray paths, aperture marks."""

    def __init__(self, optic):
        self.optic = optic

    def _surface_profile(self, k, semi, n_pts=64):
        static, params = self.optic.build()
        y = jnp.linspace(-semi, semi, n_pts)
        z = G.sag(static.geom_codes[k], static.geom_n_coeffs[k],
                  jnp.zeros_like(y), y, params.cv[k], params.conic[k],
                  params.coeffs[k], aux=static.geom_aux[k])
        return np.asarray(y), np.asarray(z)

    def view(self, fields="all", wavelengths="primary", num_rays: int = 3,
             distribution: str = "line_y", figsize=(10, 4), title=None,
             reference=None, theme: str = "light"):
        """Cross-section render (reference `optic_viewer.py` features):

        reference: None, or "chief" / "marginal" / "chief_and_marginal" —
        overlays the reference ray(s) per field as dashed lines (the
        reference's reference-ray modes).
        theme: "light" | "dark" palette.
        """
        import matplotlib.pyplot as plt

        optic = self.optic
        static, params = optic.build()
        pos = np.asarray(positions_of(static, params))
        S = static.num_surfaces

        fig, ax = plt.subplots(figsize=figsize)
        th = THEMES[theme]
        fig.patch.set_facecolor(th["bg"])
        ax.set_facecolor(th["bg"])
        for spine in ax.spines.values():
            spine.set_color(th["fg"])
        ax.tick_params(colors=th["fg"])
        ax.xaxis.label.set_color(th["fg"])
        ax.yaxis.label.set_color(th["fg"])
        ax.title.set_color(th["fg"])

        # trace ray fans per field to get paths + surface extents
        from optiland_tpu.analysis.base import resolve_fields

        field_list = resolve_fields(optic, fields)
        wl = (optic.primary_wavelength if wavelengths == "primary"
              else wavelengths)
        max_y = np.zeros(S)
        colors = plt.cm.tab10(np.linspace(0, 1, max(len(field_list), 2)))
        for fi, field in enumerate(field_list):
            hist = optic.trace(Hx=field[0], Hy=field[1], wavelength=wl,
                               num_rays=num_rays, distribution=distribution)
            ys = np.asarray(hist.y)
            zs = np.asarray(hist.z)
            inten = np.asarray(hist.intensity)
            max_y = np.maximum(max_y, np.abs(ys).max(axis=1))
            for r in range(ys.shape[1]):
                alive = bool(inten[-1, r] > 0)
                ax.plot(zs[1:, r], ys[1:, r], color=colors[fi], lw=0.7,
                        alpha=0.9 if alive else 0.25)

            # reference-ray overlays (dashed): chief = pupil center,
            # marginal = pupil edge (reference optic_viewer reference-ray
            # modes)
            ref_pupils = []
            if reference in ("chief", "chief_and_marginal"):
                ref_pupils.append(0.0)
            if reference in ("marginal", "chief_and_marginal"):
                ref_pupils.append(1.0)
            for pr in ref_pupils:
                rh = optic.trace(Hx=field[0], Hy=field[1], wavelength=wl,
                                 num_rays=1,
                                 distribution=(jnp.asarray([0.0]),
                                               jnp.asarray([pr])))
                ax.plot(np.asarray(rh.z)[1:, 0], np.asarray(rh.y)[1:, 0],
                        color=colors[fi], lw=1.4, ls="--")

        # surface profiles + physical-aperture overlays
        for k in range(1, S):
            spec = optic.surfaces.specs[k]
            has_ap = isinstance(spec.semi_aperture, (int, float))
            semi = (spec.semi_aperture if has_ap
                    else max(max_y[k] * 1.1, 1e-6))
            yy, zz = self._surface_profile(k, semi)
            ax.plot(pos[k] + zz, yy, color=th["fg"], lw=1.2)
            if has_ap:
                # aperture marks: short bars just past the clear aperture
                # (reference optic_viewer aperture overlays)
                for sgn in (+1, -1):
                    ax.plot([pos[k] + zz[-1 if sgn > 0 else 0]] * 2,
                            [sgn * semi, sgn * semi * 1.15],
                            color=th["aperture"], lw=2.5)

        # connect lens edges for glass gaps
        for k in range(1, S - 1):
            if static.interactions[k] == 0 and not static.is_reflective[k]:
                from optiland_tpu.materials.dispersion import FORMULA_IDEAL

                m = optic.surfaces.specs[k].material
                is_air = (m.formula == FORMULA_IDEAL
                          and m.coefficients[0] == 1.0)
                if not is_air:
                    for sgn in (+1, -1):
                        s1 = optic.surfaces.specs[k].semi_aperture or max_y[k] * 1.1
                        s2 = (optic.surfaces.specs[k + 1].semi_aperture
                              or max_y[k + 1] * 1.1)
                        y1, z1 = self._surface_profile(k, s1)
                        y2, z2 = self._surface_profile(k + 1, s2)
                        ax.plot([pos[k] + z1[-1 if sgn > 0 else 0],
                                 pos[k + 1] + z2[-1 if sgn > 0 else 0]],
                                [sgn * s1, sgn * s2], color=th["fg"],
                                lw=1.0)

        ax.set_xlabel("z (mm)")
        ax.set_ylabel("y (mm)")
        ax.set_title(title or optic.name)
        ax.set_aspect("equal", adjustable="datalim")
        fig.tight_layout()
        return fig, ax


class LensInfoViewer:
    """Prescription table (reference LensInfoViewer)."""

    def __init__(self, optic):
        self.optic = optic

    def table_rows(self):
        optic = self.optic
        rows = []
        for i, s in enumerate(optic.surfaces.specs):
            kind = ("Object" if i == 0
                    else "Image" if i == len(optic.surfaces.specs) - 1
                    else s.surface_type if s.surface_type != "standard"
                    else s.geometry)
            rows.append({
                "index": i,
                "type": kind + (" (stop)" if s.is_stop else ""),
                "radius": s.radius,
                "thickness": s.thickness,
                "conic": s.conic,
                "material": s.material.name or "air",
                "semi-aperture": s.semi_aperture,
                "comment": s.comment,
            })
        return rows

    def view(self):
        rows = self.table_rows()
        hdr = (f"{'#':>3} {'type':16} {'radius':>12} {'thickness':>12} "
               f"{'conic':>8} {'material':14} {'semi-ap':>8}")
        print(hdr)
        print("-" * len(hdr))
        for r in rows:
            sa = "-" if r["semi-aperture"] is None else f"{r['semi-aperture']:.3f}"
            print(f"{r['index']:>3} {r['type']:16} {r['radius']:>12.5g} "
                  f"{r['thickness']:>12.5g} {r['conic']:>8.4g} "
                  f"{r['material']:14} {sa:>8}")
        return rows


class SurfaceSagViewer:
    """Sag map + cross-sections of one surface (reference
    `visualization/surface_sag_viewer.py`)."""

    def __init__(self, optic):
        self.optic = optic

    def sag_grid(self, surface_index: int, semi: float | None = None,
                 n: int = 64):
        static, params = self.optic.build()
        k = surface_index
        if semi is None:
            spec = self.optic.surfaces.specs[k]
            semi = (spec.semi_aperture
                    if isinstance(spec.semi_aperture, (int, float)) else 10.0)
        lin = jnp.linspace(-semi, semi, n)
        X, Y = jnp.meshgrid(lin, lin)
        Z = G.sag(static.geom_codes[k], static.geom_n_coeffs[k],
                  X.ravel(), Y.ravel(), params.cv[k], params.conic[k],
                  params.coeffs[k], aux=static.geom_aux[k])
        return (np.asarray(X), np.asarray(Y),
                np.asarray(Z).reshape(n, n), float(semi))

    def view(self, surface_index: int, semi: float | None = None,
             n: int = 64, figsize=(10, 4)):
        import matplotlib.pyplot as plt

        X, Y, Z, semi = self.sag_grid(surface_index, semi, n)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=figsize)
        im = ax1.imshow(Z, extent=[-semi, semi, -semi, semi],
                        origin="lower", cmap="viridis")
        fig.colorbar(im, ax=ax1, label="sag (mm)")
        ax1.set_title(f"surface {surface_index} sag")
        ax1.set_xlabel("x (mm)")
        ax1.set_ylabel("y (mm)")
        mid = Z.shape[0] // 2
        ax2.plot(X[mid], Z[mid], label="y = 0")
        ax2.plot(Y[:, mid], Z[:, mid], "--", label="x = 0")
        ax2.set_xlabel("coordinate (mm)")
        ax2.set_ylabel("sag (mm)")
        ax2.legend()
        ax2.grid(True)
        fig.tight_layout()
        return fig, (ax1, ax2)
