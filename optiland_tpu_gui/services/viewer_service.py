"""Viewer panel backend (reference `optiland_gui/viewer_panel.py:1-832`
minus the Qt chrome): settings model for the 2D/3D system viewers and the
surface-sag viewer, producing matplotlib figures headless (Agg-safe) so the
panel only has to embed the canvas."""

from __future__ import annotations

from dataclasses import asdict, dataclass


@dataclass
class ViewerSettings:
    """The viewer panel's settings strip (reference `ViewerControls`)."""

    fields: object = "all"          # "all" | list of field indices
    wavelengths: object = "primary"  # "primary" | "all" | list of values
    num_rays: int = 3
    distribution: str = "line_y"
    dark_mode: bool = False
    projection: str = "2d"          # "2d" | "3d"

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ViewerSettings":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


class ViewerService:
    """Headless core of the viewer panel."""

    def __init__(self, connector):
        self.connector = connector
        self.settings = ViewerSettings()
        # the panel re-renders on prescription changes
        self.render_count = 0
        connector.system_changed.connect(self._invalidate)
        self._stale = True

    def _invalidate(self):
        self._stale = True

    @property
    def needs_render(self) -> bool:
        return self._stale

    # -- rendering -------------------------------------------------------
    def render(self):
        """Render the current system with the current settings; returns the
        matplotlib figure the panel embeds."""
        from optiland_tpu_gui.plot_utils import apply_theme

        s = self.settings
        optic = self.connector.get_optic()
        theme = "dark" if s.dark_mode else "light"
        if s.projection == "3d":
            from optiland_tpu.visualization.viewer3d import OpticViewer3D

            fig, _ax = OpticViewer3D(optic).view(
                fields=s.fields, wavelengths=s.wavelengths,
                num_rays=max(s.num_rays, 2))
        else:
            from optiland_tpu.visualization.viewer import OpticViewer

            fig, _ax = OpticViewer(optic).view(
                fields=s.fields, wavelengths=s.wavelengths,
                num_rays=s.num_rays, distribution=s.distribution,
                theme=theme)
        apply_theme(fig, theme)
        self._stale = False
        self.render_count += 1
        return fig

    def render_sag(self, surface_index: int, **kwargs):
        """Surface-sag cross-section/heatmap figure (reference
        `surface_sag_viewer.py`)."""
        from optiland_tpu.visualization.viewer import SurfaceSagViewer

        viewer = SurfaceSagViewer(self.connector.get_optic())
        return viewer.view(surface_index, **kwargs)

    def info_table(self) -> list:
        """Prescription rows for the side table (reference viewer panel's
        system summary)."""
        from optiland_tpu.visualization.viewer import LensInfoViewer

        return LensInfoViewer(self.connector.get_optic()).table_rows()

    # -- settings --------------------------------------------------------
    def update_settings(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if not hasattr(self.settings, k):
                raise AttributeError(f"unknown viewer setting {k!r}")
            setattr(self.settings, k, v)
        self._stale = True
