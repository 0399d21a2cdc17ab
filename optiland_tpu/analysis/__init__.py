from optiland_tpu.analysis.spot import SpotDiagram
from optiland_tpu.analysis.fans import BestFitRayFan, RayFan
from optiland_tpu.analysis.distortion import Distortion, GridDistortion
from optiland_tpu.analysis.field_curvature import FieldCurvature
from optiland_tpu.analysis.rms_vs_field import (
    RmsSpotSizeVsField,
    RmsWavefrontErrorVsField,
)
from optiland_tpu.analysis.encircled_energy import EncircledEnergy
from optiland_tpu.analysis.y_ybar import YYbar
from optiland_tpu.analysis.through_focus import (
    ThroughFocusMTF,
    ThroughFocusSpotDiagram,
)
from optiland_tpu.analysis.pupil_aberration import (
    AngleVsHeight,
    FieldIncidentAngleVsHeight,
    PupilAberration,
    PupilIncidentAngleVsHeight,
)
from optiland_tpu.analysis.irradiance import IncoherentIrradiance
from optiland_tpu.analysis.intensity import RadiantIntensity
from optiland_tpu.analysis.jones_pupil import JonesPupil
from optiland_tpu.analysis.mtf_vs_field import MTFvsField
from optiland_tpu.analysis.image_simulation import (
    DistortionWarper,
    ImageSimulationEngine,
    PSFBasisGenerator,
    SpatiallyVariableSimulator,
)

__all__ = [
    "ImageSimulationEngine",
    "PSFBasisGenerator",
    "SpatiallyVariableSimulator",
    "DistortionWarper",
    "SpotDiagram",
    "BestFitRayFan",
    "RayFan",
    "Distortion",
    "GridDistortion",
    "FieldCurvature",
    "RmsSpotSizeVsField",
    "RmsWavefrontErrorVsField",
    "EncircledEnergy",
    "YYbar",
    "ThroughFocusSpotDiagram",
    "ThroughFocusMTF",
    "PupilAberration",
    "AngleVsHeight",
    "FieldIncidentAngleVsHeight",
    "PupilIncidentAngleVsHeight",
    "IncoherentIrradiance",
    "RadiantIntensity",
    "JonesPupil",
    "MTFvsField",
]
