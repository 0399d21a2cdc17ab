"""Phase interaction (generalized Snell) tests."""

import numpy as np

import optiland_tpu  # noqa: F401
from optiland_tpu.system.optic import Optic


def test_linear_grating_phase_deflection():
    wl = 0.55
    k0 = 2 * np.pi / (wl * 1e-3)
    g = Optic()
    g.add_surface(index=0, radius=np.inf, thickness=np.inf)
    g.add_surface(index=1, radius=np.inf, thickness=10.0, is_stop=True,
                  surface_type="phase",
                  phase_profile=("linear_grating", 0.0, 0.3 * k0))
    g.add_surface(index=2)
    g.set_aperture("EPD", 4.0)
    g.add_wavelength(wl)
    h = g.trace(num_rays=3)
    np.testing.assert_allclose(np.asarray(h.M[-1]), 0.3, atol=1e-12)


def test_radial_phase_metalens_focuses():
    wl = 0.55
    f = 100.0
    k0 = 2 * np.pi / (wl * 1e-3)
    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=np.inf, thickness=f, is_stop=True,
                     surface_type="phase",
                     phase_profile=("radial", [-k0 / (2 * f)]))
    lens.add_surface(index=2)
    lens.set_aperture("EPD", 8.0)
    lens.add_wavelength(wl)
    h = lens.trace(num_rays=5)
    y = np.asarray(h.y[-1])
    assert np.abs(y).max() < 0.005  # collimated in -> focused at f

    # phase adds OPD: -phi/k0
    opd = np.asarray(h.opd[-1])
    assert opd.std() > 0


def test_phase_evanescent_clipped():
    wl = 0.55
    k0 = 2 * np.pi / (wl * 1e-3)
    g = Optic()
    g.add_surface(index=0, radius=np.inf, thickness=np.inf)
    g.add_surface(index=1, radius=np.inf, thickness=5.0, is_stop=True,
                  surface_type="phase",
                  phase_profile=("linear_grating", 0.0, 1.5 * k0))
    g.add_surface(index=2)
    g.set_aperture("EPD", 4.0)
    g.add_wavelength(wl)
    h = g.trace(num_rays=3)
    assert np.all(np.asarray(h.intensity[-1]) == 0)
