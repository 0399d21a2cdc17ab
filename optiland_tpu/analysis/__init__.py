from optiland_tpu.analysis.spot import SpotDiagram
from optiland_tpu.analysis.fans import RayFan
from optiland_tpu.analysis.distortion import Distortion, GridDistortion
from optiland_tpu.analysis.field_curvature import FieldCurvature
from optiland_tpu.analysis.rms_vs_field import (
    RmsSpotSizeVsField,
    RmsWavefrontErrorVsField,
)
from optiland_tpu.analysis.encircled_energy import EncircledEnergy
from optiland_tpu.analysis.y_ybar import YYbar

__all__ = [
    "SpotDiagram",
    "RayFan",
    "Distortion",
    "GridDistortion",
    "FieldCurvature",
    "RmsSpotSizeVsField",
    "RmsWavefrontErrorVsField",
    "EncircledEnergy",
    "YYbar",
]
