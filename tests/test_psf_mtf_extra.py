"""MMDFT PSF, SampledMTF, HuygensMTF tests (parity where the reference
allows cheap configs, physics sanity otherwise)."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


@pytest.fixture(scope="module")
def lens():
    return CookeTriplet()


def test_mmdft_matches_fft_psf(lens):
    """With image sampling equal to the FFT grid, MMDFT reproduces FFTPSF."""
    from optiland_tpu.psf import FFTPSF, MMDFTPSF

    fft = FFTPSF(lens, (0.0, 0.0), wavelength=0.55, num_rays=32, grid_size=64)
    # MMDFT with default sampling = grid_size emulation
    mm = MMDFTPSF(lens, (0.0, 0.0), wavelength=0.55, num_rays=32)
    np.testing.assert_allclose(float(mm.strehl_ratio()),
                               float(fft.strehl_ratio()), rtol=1e-3)


def test_mmdft_parity_with_reference(lens, reference):
    from optiland.psf import MMDFTPSF as RefMM

    from optiland_tpu.psf import MMDFTPSF

    ref_mod = __import__("optiland.samples.objectives",
                         fromlist=["CookeTriplet"])
    ref = RefMM(ref_mod.CookeTriplet(), (0.0, 0.0), 0.55, num_rays=32)
    got = MMDFTPSF(lens, (0.0, 0.0), wavelength=0.55, num_rays=32)
    assert got.psf.shape == np.asarray(ref.psf).shape
    np.testing.assert_allclose(np.asarray(got.psf), np.asarray(ref.psf),
                               rtol=1e-3, atol=1e-5)


def test_sampled_mtf_parity(lens, reference):
    from optiland.mtf import SampledMTF as RefSampled

    from optiland_tpu.mtf import SampledMTF

    ref_mod = __import__("optiland.samples.objectives",
                         fromlist=["CookeTriplet"])
    freqs = [(0.0, 0.0), (10.0, 0.0), (0.0, 25.0), (50.0, 50.0)]
    ref = RefSampled(ref_mod.CookeTriplet(), (0.0, 0.0), 0.55, num_rays=16,
                     zernike_terms=16)
    got = SampledMTF(lens, (0.0, 0.0), 0.55, num_rays=16, zernike_terms=16)
    ref_vals = [float(v) for v in ref.calculate_mtf(freqs)]
    got_vals = got.calculate_mtf(freqs)
    np.testing.assert_allclose(got_vals, ref_vals, rtol=5e-3, atol=1e-4)


def test_huygens_mtf_physical(lens):
    from optiland_tpu.mtf import HuygensMTF

    m = HuygensMTF(lens, (0.0, 0.0), 0.55, num_rays=24, image_size=32,
                   use_pallas=False)
    t = np.asarray(m.mtf[0])
    assert t[0] == pytest.approx(1.0)
    assert np.all(t <= 1.0 + 1e-9) and np.all(t >= 0)
