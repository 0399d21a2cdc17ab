from optiland_tpu.geometry.surfaces import (
    GEOM_PLANE,
    GEOM_CONIC,
    GEOM_EVEN_ASPHERE,
    GEOM_ODD_ASPHERE,
    GEOM_POLYNOMIAL_XY,
    sag,
    sag_and_grad,
    surface_normal,
    intersect,
)

__all__ = [
    "GEOM_PLANE",
    "GEOM_CONIC",
    "GEOM_EVEN_ASPHERE",
    "GEOM_ODD_ASPHERE",
    "GEOM_POLYNOMIAL_XY",
    "sag",
    "sag_and_grad",
    "surface_normal",
    "intersect",
]
