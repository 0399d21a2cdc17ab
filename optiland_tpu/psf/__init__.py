from optiland_tpu.psf.fft import FFTPSF, calculate_grid_size
from optiland_tpu.psf.huygens import HuygensPSF

__all__ = ["FFTPSF", "HuygensPSF", "calculate_grid_size"]
