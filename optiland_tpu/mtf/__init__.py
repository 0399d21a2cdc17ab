from optiland_tpu.mtf.fft import FFTMTF
from optiland_tpu.mtf.geometric import GeometricMTF

__all__ = ["FFTMTF", "GeometricMTF"]
