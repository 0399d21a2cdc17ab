from optiland_tpu.materials.dispersion import (
    FORMULA_IDEAL,
    MAX_COEFFS,
    material_index,
    material_extinction,
)
from optiland_tpu.materials.catalog import resolve_material

__all__ = [
    "FORMULA_IDEAL",
    "MAX_COEFFS",
    "material_index",
    "material_extinction",
    "resolve_material",
]
