from optiland_tpu.models.objectives import CookeTriplet, DoubleGauss, ReverseTelephoto

__all__ = ["CookeTriplet", "DoubleGauss", "ReverseTelephoto"]
