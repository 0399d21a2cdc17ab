from optiland_tpu.polarization.state import PolarizationState
from optiland_tpu.polarization import jones, prt

__all__ = ["PolarizationState", "jones", "prt"]
