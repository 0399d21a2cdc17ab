from optiland_tpu.core.rays import Rays

__all__ = ["Rays"]
