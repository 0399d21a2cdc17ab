from optiland_tpu.mtf.fft import FFTMTF
from optiland_tpu.mtf.geometric import GeometricMTF
from optiland_tpu.mtf.sampled import SampledMTF
from optiland_tpu.mtf.huygens import HuygensMTF

__all__ = ["FFTMTF", "GeometricMTF", "SampledMTF", "HuygensMTF"]
