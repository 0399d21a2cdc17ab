from optiland_tpu.psf.fft import FFTPSF, calculate_grid_size
from optiland_tpu.psf.huygens import HuygensPSF
from optiland_tpu.psf.mmdft import MMDFTPSF

__all__ = ["FFTPSF", "HuygensPSF", "MMDFTPSF", "calculate_grid_size"]
