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


def test_phase_on_curved_carrier_stays_forward():
    """A radial phase profile on a curved (conic) carrier refracts like a
    metalens and keeps propagating forward. The reference's
    PhaseInteractionModel emits backward rays here (its +N convention only
    matches its Plane geometry, `phase_interaction_model.py:104-107` vs
    `standard.py:164-168`); we deviate deliberately to correct physics."""
    import math

    import numpy as np

    from optiland_tpu.system.optic import Optic

    k0 = 2 * np.pi / (0.55e-3)
    f = 100.0
    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=200.0, thickness=100.0, is_stop=True,
                     surface_type="phase",
                     phase_profile=("radial", [-k0 / (2 * f)]))
    lens.add_surface(index=2)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.55, is_primary=True)
    h = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
    N = np.asarray(h.N[-1])
    assert (N > 0).all()  # forward propagation preserved
    # the metalens phase focuses the collimated beam near z = f: the spot
    # at the image plane (100 mm behind the vertex) is far smaller than
    # the entrance beam
    y = np.asarray(h.y[-1])
    i = np.asarray(h.intensity[-1])
    assert np.abs(y[i > 0]).max() < 0.2
