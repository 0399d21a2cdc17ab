from optiland_tpu.mtf.fft import FFTMTF, ScalarFFTMTF, VectorialFFTMTF, get_working_FNO
from optiland_tpu.mtf.geometric import GeometricMTF
from optiland_tpu.mtf.sampled import SampledMTF
from optiland_tpu.mtf.huygens import HuygensMTF

__all__ = ["FFTMTF", "ScalarFFTMTF", "VectorialFFTMTF", "get_working_FNO",
           "GeometricMTF", "SampledMTF", "HuygensMTF"]
