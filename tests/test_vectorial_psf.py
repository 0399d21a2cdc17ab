"""Vectorial PSF/MTF parity and consistency tests."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet
from optiland_tpu.polarization import PolarizationState
from optiland_tpu.psf import (
    FFTPSF,
    HuygensPSF,
    ScalarFFTPSF,
    ScalarHuygensPSF,
    VectorialFFTPSF,
    VectorialHuygensPSF,
)


def test_fftpsf_factory_dispatch():
    lens = CookeTriplet()
    psf = FFTPSF(lens, field=(0.0, 0.0), num_rays=32)
    assert isinstance(psf, ScalarFFTPSF)
    lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
    psf_v = FFTPSF(lens, field=(0.0, 0.0), num_rays=32)
    assert isinstance(psf_v, VectorialFFTPSF)


def test_vectorial_fft_strehl_matches_scalar():
    lens = CookeTriplet()
    strehl_scalar = float(FFTPSF(lens, field=(0.0, 0.0),
                                 num_rays=64).strehl_ratio())
    lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
    strehl_h = float(FFTPSF(lens, field=(0.0, 0.0),
                            num_rays=64).strehl_ratio())
    lens.set_polarization("unpolarized")
    strehl_u = float(FFTPSF(lens, field=(0.0, 0.0),
                            num_rays=64).strehl_ratio())
    np.testing.assert_allclose(strehl_h, strehl_scalar, atol=1e-2)
    np.testing.assert_allclose(strehl_u, strehl_scalar, atol=1e-2)


def test_vectorial_fft_psf_parity_vs_reference(reference):
    """Full-grid parity of the vectorial FFT PSF vs the mounted reference on
    the Cooke triplet with horizontal polarization."""
    from optiland.psf.vectorial_fft import VectorialFFTPSF as RefVPSF
    from optiland.rays import PolarizationState as RefState
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref_lens = RefCooke()
    ref_lens.updater.set_polarization(
        RefState(is_polarized=True, Ex=1.0, Ey=0.0, phase_x=0.0, phase_y=0.0))
    ref = RefVPSF(ref_lens, field=(0.0, 0.0), wavelength=0.55, num_rays=32)
    want = np.asarray(ref.psf)

    lens = CookeTriplet()
    lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
    got = np.asarray(VectorialFFTPSF(lens, field=(0.0, 0.0),
                                     wavelength=[0.55], num_rays=32,
                                     grid_size=want.shape[0]).psf)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4 * want.max())


def test_vectorial_huygens_strehl_matches_scalar():
    lens = CookeTriplet()
    s = float(ScalarHuygensPSF(lens, field=(0.0, 0.0), num_rays=32,
                               image_size=32, use_pallas=False).strehl_ratio())
    lens.set_polarization("unpolarized")
    psf_v = HuygensPSF(lens, field=(0.0, 0.0), num_rays=32, image_size=32)
    assert isinstance(psf_v, VectorialHuygensPSF)
    v = float(psf_v.strehl_ratio())
    np.testing.assert_allclose(v, s, atol=2e-2)


def test_vectorial_fft_mtf_via_factory():
    from optiland_tpu.mtf.fft import FFTMTF

    lens = CookeTriplet()
    lens.set_polarization("unpolarized")
    mtf = FFTMTF(lens, fields=[(0.0, 0.0)], num_rays=32)
    t, s = mtf.mtf[0]
    t = np.asarray(t)
    assert t[0] > 0.99 and np.all(t <= 1.0) and np.all(np.isfinite(t))
