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

    def get_column_headers_for(self, row: int) -> list[str]:
        """Per-row header variant (reference `get_column_headers(row)`):
        thin-lens (paraxial) rows edit Focal Length where standard rows
        edit Radius."""
        cols = list(COLUMNS)
        if self._spec(row).surface_type == "paraxial":
            cols[COL_RADIUS] = "Focal Length"
        return cols

    def get_surface_type_info(self, row: int) -> dict:
        """Everything the type-dependent editors need for one row
        (reference `surface_service.py:153-184`)."""
        s = self._spec(row)
        return {
            "surface_type": s.surface_type,
            "geometry": s.geometry,
            "is_stop": s.is_stop,
            "is_paraxial": s.surface_type == "paraxial",
            "n_coefficients": len(s.coefficients),
            "geom_params": dict(s.geom_params),
        }

    # -- cell access -----------------------------------------------------
    def get_surface_data(self, row: int, col: int):
        s = self._spec(row)
        if col == COL_TYPE:
            return (s.geometry if s.geometry != "standard"
                    else s.surface_type)
        if col == COL_COMMENT:
            return s.comment
        if col == COL_RADIUS:
            if s.surface_type == "paraxial":
                return s.focal_length
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
                if s.surface_type == "paraxial":
                    s.focal_length = float(value)
                else:
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

    # -- geometry parameter editors (freeform dialogs) -------------------
    # Parameter names per geometry kind; everything lives either in the
    # spec's scalar fields (radius/conic), the flat `coefficients` tuple,
    # or the `geom_params` dict (layouts documented at the top of
    # `optiland_tpu/geometry/surfaces.py`; reference counterparts:
    # `optiland_gui/services/surface_service.py:624-806`).
    GEOM_PARAM_KEYS = {
        "standard": ("radius", "conic"),
        "even_asphere": ("radius", "conic", "coefficients"),
        "odd_asphere": ("radius", "conic", "coefficients"),
        "polynomial": ("radius", "conic", "coefficients"),
        "biconic": ("radius", "conic", "radius_y", "conic_y"),
        "toroidal": ("radius", "conic", "radius_y", "coeffs_poly_y"),
        "chebyshev": ("radius", "conic", "norm_x", "norm_y", "coefficients"),
        "zernike": ("radius", "conic", "norm_radius", "coefficients",
                    "zernike_type"),
        "forbes_qbfs": ("radius", "conic", "norm_radius", "coefficients"),
        "forbes_q2d": ("radius", "conic", "norm_radius", "terms"),
        "grid_sag": ("x_grid", "y_grid", "z_grid"),
        "nurbs": ("degree_u", "degree_v", "control_points", "weights",
                  "knots_u", "knots_v"),
    }

    def get_surface_geometry_params(self, row: int) -> dict:
        """Normalized editable dict for the geometry-settings dialog."""
        s = self._spec(row)
        keys = self.GEOM_PARAM_KEYS.get(s.geometry,
                                        ("radius", "conic", "coefficients"))
        out: dict = {"geometry": s.geometry}
        for k in keys:
            if k == "radius":
                out[k] = s.radius
            elif k == "conic":
                out[k] = s.conic
            elif k == "coefficients" and "coefficients" not in s.geom_params:
                out[k] = list(s.coefficients)
            else:
                v = s.geom_params.get(k)
                out[k] = list(v) if isinstance(v, (list, tuple)) else v
        return out

    def set_surface_geometry_params(self, row: int, params: dict) -> None:
        """Write the dialog's dict back into the spec (one undo step)."""
        keys = self.GEOM_PARAM_KEYS.get(
            self._spec(row).geometry, ("radius", "conic", "coefficients"))

        def apply(optic):
            s = optic.surfaces.specs[row]
            for k, v in params.items():
                if k == "geometry":
                    continue
                if k not in keys:
                    raise KeyError(
                        f"{k!r} is not a parameter of {s.geometry!r}")
                if k == "radius":
                    s.radius = _parse_radius(v)
                elif k == "conic":
                    s.conic = float(v)
                elif k == "coefficients" and "coefficients" not in \
                        s.geom_params and s.geometry in (
                            "standard", "even_asphere", "odd_asphere",
                            "polynomial"):
                    s.coefficients = tuple(float(c) for c in v)
                else:
                    s.geom_params[k] = (
                        list(v) if isinstance(v, (list, tuple)) else v)
            optic._dirty()

        self.connector.mutate(apply)

    def get_material_display(self, row: int) -> str:
        """Material column text with the resolved index at the primary
        wavelength appended, e.g. 'N-BK7 (n=1.5168)' (reference
        `_get_material_data`)."""
        s = self._spec(row)
        base = self.get_surface_data(row, COL_MATERIAL)
        try:
            import jax.numpy as jnp

            from optiland_tpu.materials.dispersion import material_index

            optic = self.connector.get_optic()
            lam = optic.primary_wavelength
            m = s.material
            n = float(material_index(
                m.formula, m.n_coeffs, jnp.asarray(m.coefficients), lam))
            return f"{base} (n={n:.4f})"
        except Exception:
            return str(base)

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
