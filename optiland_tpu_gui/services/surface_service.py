"""Lens-editor spreadsheet semantics (reference
`optiland_gui/services/surface_service.py:27-806`): column headers, typed
get/set of per-surface cells, add/remove rows. The Qt table model is a thin
wrapper over this service, so every behavior is testable headless."""

from __future__ import annotations

import math

from optiland_tpu.materials.catalog import resolve_material

COLUMNS = ["Type", "Comment", "Radius", "Thickness", "Material", "Conic",
           "Semi-Diameter"]
COL_TYPE, COL_COMMENT, COL_RADIUS, COL_THICKNESS, COL_MATERIAL, COL_CONIC, \
    COL_SEMI_DIAMETER = range(7)

SURFACE_TYPES = ["standard", "paraxial", "grating", "phase", "even_asphere",
                 "odd_asphere", "polynomial", "biconic", "toroidal",
                 "chebyshev", "zernike", "forbes_qbfs", "forbes_q2d",
                 "grid_sag", "nurbs"]


class SurfaceService:
    def __init__(self, connector):
        self.connector = connector

    # -- structure -------------------------------------------------------
    def get_column_headers(self) -> list[str]:
        return list(COLUMNS)

    def get_surface_count(self) -> int:
        return len(self.connector.get_optic().surfaces)

    def get_available_surface_types(self) -> list[str]:
        return list(SURFACE_TYPES)

    def _spec(self, row: int):
        return self.connector.get_optic().surfaces.specs[row]

    def row_label(self, row: int) -> str:
        optic = self.connector.get_optic()
        n = len(optic.surfaces)
        if row == 0:
            return "Object"
        if row == n - 1:
            return "Image"
        stop = next((i for i, s in enumerate(optic.surfaces.specs)
                     if s.is_stop), None)
        return "Stop" if row == stop else str(row)

    # -- cell access -----------------------------------------------------
    def get_surface_data(self, row: int, col: int):
        s = self._spec(row)
        if col == COL_TYPE:
            return (s.geometry if s.geometry != "standard"
                    else s.surface_type)
        if col == COL_COMMENT:
            return s.comment
        if col == COL_RADIUS:
            return s.radius
        if col == COL_THICKNESS:
            return s.thickness
        if col == COL_MATERIAL:
            m = s.material
            name = getattr(m, "name", None)
            if name:
                return name
            n_val = getattr(m, "nd", None)
            return "air" if n_val in (None, 1.0) else str(n_val)
        if col == COL_CONIC:
            return s.conic
        if col == COL_SEMI_DIAMETER:
            sa = s.semi_aperture
            return sa if isinstance(sa, (int, float)) else None
        raise IndexError(col)

    def set_surface_data(self, row: int, col: int, value) -> None:
        def apply(optic):
            s = optic.surfaces.specs[row]
            if col == COL_COMMENT:
                s.comment = str(value)
            elif col == COL_RADIUS:
                s.radius = _parse_radius(value)
            elif col == COL_THICKNESS:
                s.thickness = float(value)
            elif col == COL_MATERIAL:
                s.material = resolve_material(_parse_material(value))
            elif col == COL_CONIC:
                s.conic = float(value)
            elif col == COL_SEMI_DIAMETER:
                s.semi_aperture = None if value in (None, "") else float(value)
            elif col == COL_TYPE:
                v = str(value)
                if v not in SURFACE_TYPES:
                    raise ValueError(f"Unknown surface type {v!r}")
                if v in ("standard", "paraxial", "grating", "phase"):
                    s.surface_type = v
                    s.geometry = "standard"
                else:
                    s.surface_type = "standard"
                    s.geometry = v
            else:
                raise IndexError(col)
            optic._dirty()

        self.connector.mutate(apply)

    # -- row operations --------------------------------------------------
    def add_surface(self, row: int) -> None:
        """Insert a plane surface before `row` (reference
        `surface_service.py` insert semantics)."""
        from optiland_tpu.system.spec import SurfaceSpec

        def apply(optic):
            optic.surfaces.specs.insert(
                row, SurfaceSpec(radius=math.inf, thickness=0.0))
            optic._dirty()

        self.connector.mutate(apply)

    def remove_surface(self, row: int) -> None:
        n = self.get_surface_count()
        if row <= 0 or row >= n - 1:
            raise ValueError("cannot remove the object or image surface")

        def apply(optic):
            optic.surfaces.specs.pop(row)
            optic._dirty()

        self.connector.mutate(apply)

    def set_stop(self, row: int) -> None:
        def apply(optic):
            for i, s in enumerate(optic.surfaces.specs):
                s.is_stop = i == row
            optic._dirty()

        self.connector.mutate(apply)


def _parse_radius(value) -> float:
    if isinstance(value, str) and value.strip().lower() in (
            "inf", "infinity", ""):
        return math.inf
    return float(value)


def _parse_material(value):
    if isinstance(value, str):
        v = value.strip()
        try:
            return float(v)
        except ValueError:
            return v
    return value
