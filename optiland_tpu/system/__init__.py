from optiland_tpu.system.spec import SurfaceSpec, SystemStatic, SystemParams
from optiland_tpu.system.optic import Optic

__all__ = ["SurfaceSpec", "SystemStatic", "SystemParams", "Optic"]
