"""Wave optics (reference Tutorial_4a/4b/4c): OPD maps, Zernike
decomposition of the wavefront, FFT PSF with Strehl ratio, and FFT MTF."""

import numpy as np

from _common import maybe_save
from optiland_tpu.models import CookeTriplet
from optiland_tpu.mtf import FFTMTF
from optiland_tpu.psf import FFTPSF
from optiland_tpu.wavefront import OPD, ZernikeOPD


def main():
    lens = CookeTriplet()

    opd = OPD(lens, (0.0, 1.0), 0.55, num_rings=8)
    print(f"full-field OPD: rms = {float(opd.rms()):.4f} waves")

    zopd = ZernikeOPD(lens, (0.0, 1.0), 0.55, num_rings=10, num_terms=16)
    coeffs = np.asarray(zopd.coeffs)
    print("first 8 Zernike (fringe) coefficients [waves]:")
    print(np.array2string(coeffs[:8], precision=4))

    psf = FFTPSF(lens, (0.0, 0.0), wavelength=[0.55], num_rays=64,
                 grid_size=128)
    print(f"on-axis Strehl ratio = {float(psf.strehl_ratio()):.4f}")

    mtf = FFTMTF(lens, wavelength=0.55, num_rays=64, grid_size=128)
    out = mtf.view()
    fig = out[0] if isinstance(out, tuple) else out
    maybe_save(fig, "05_mtf.png")
    return coeffs


if __name__ == "__main__":
    main()
