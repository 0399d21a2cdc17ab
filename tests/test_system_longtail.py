"""System-model long tail: scale/flip/__add__, update_paraxial, Sobol,
OPDFan, converters, cached aimer, freeform variable kinds, shgo +
orthogonal-descent optimizers (VERDICT.md round-1 item 8)."""

import math

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet
from optiland_tpu.system.optic import Optic


def test_scale_system_parity(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref = RefCooke()
    ref.scale_system(2.0)
    got = CookeTriplet()
    got.scale_system(2.0)
    np.testing.assert_allclose(float(got.paraxial.f2()),
                               float(np.asarray(ref.paraxial.f2())),
                               rtol=1e-10)
    r = ref.trace(Hx=0.0, Hy=1.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    h = got.trace(Hx=0.0, Hy=1.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    np.testing.assert_allclose(np.asarray(h.y[-1]), np.asarray(r.y),
                               rtol=1e-9, atol=1e-11)


def test_scale_system_asphere():
    """Asphere sag is scale-invariant in normalized coordinates."""
    lens = Optic("A")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     surface_type="even_asphere",
                     coefficients=(1e-6, -3e-10), is_stop=True)
    lens.add_surface(index=2, radius=-50.0, thickness=45.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.55, is_primary=True)
    f_before = float(lens.paraxial.f2())
    lens.scale_system(3.0)
    f_after = float(lens.paraxial.f2())
    np.testing.assert_allclose(f_after, 3.0 * f_before, rtol=1e-6)


def test_flip_parity(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref = RefCooke()
    ref.flip()
    got = CookeTriplet()
    got.flip()
    r = ref.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    h = got.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    np.testing.assert_allclose(np.asarray(h.y[-1]), np.asarray(r.y),
                               rtol=1e-9, atol=1e-12)


def test_add_concatenation():
    combined = CookeTriplet() + CookeTriplet()
    assert len(combined.surfaces.specs) == 14
    assert sum(s.is_stop for s in combined.surfaces.specs) == 1
    h = combined.trace(Hx=0.0, Hy=0.0, num_rays=6)
    assert np.isfinite(np.asarray(h.y[-1])).all()


def test_update_paraxial_semi_apertures(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    got = CookeTriplet()
    sa = got.update_paraxial()
    ref = RefCooke()
    ref.update_paraxial()
    ref_sa = np.array([
        float(np.asarray(s.semi_aperture))
        for s in ref.surface_group.surfaces
    ])
    np.testing.assert_allclose(sa, ref_sa, rtol=1e-8)


def test_sobol_distribution():
    from optiland_tpu.core.distributions import generate

    x, y = generate("sobol", 128)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-12).all()
    # low discrepancy: mean radius^2 of an area-uniform disk sample is 1/2
    assert abs(float(r2.mean()) - 0.5) < 0.05


def test_opd_fan():
    from optiland_tpu.wavefront import OPDFan

    fan = OPDFan(CookeTriplet(), num_rays=16)
    px_, w = fan.fan_y(0, 0)
    assert np.asarray(w).shape == (16,)
    # on-axis fan is symmetric in Py
    w = np.asarray(w)
    np.testing.assert_allclose(w, w[::-1], atol=1e-8)


def test_paraxial_to_thick_lens_converter():
    from optiland_tpu.system.converters import convert_to_thick_lens

    lens = Optic("Thin")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, surface_type="paraxial", f=50.0,
                     thickness=50.0, is_stop=True)
    lens.add_surface(index=2)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.5876, is_primary=True)
    f_before = float(lens.paraxial.f2())
    convert_to_thick_lens(lens, material="N-BK7", center_thickness=3.0)
    assert len(lens.surfaces.specs) == 4
    f_after = float(lens.paraxial.f2())
    # lensmaker solve preserves the focal length (thick-lens principal
    # planes shift slightly; EFL is the conserved quantity)
    np.testing.assert_allclose(f_after, f_before, rtol=1e-6)


def test_cached_aimer():
    lens = CookeTriplet()
    lens.set_ray_aiming("cached")
    h1 = lens.trace(Hx=0.0, Hy=1.0, num_rays=6)
    assert len(lens._aim_cache) == 1
    h2 = lens.trace(Hx=0.0, Hy=1.0, num_rays=6)
    assert len(lens._aim_cache) == 1  # hit, not a second entry
    np.testing.assert_array_equal(np.asarray(h1.y[-1]), np.asarray(h2.y[-1]))
    lens2 = CookeTriplet()
    lens2.set_ray_aiming("iterative")
    h3 = lens2.trace(Hx=0.0, Hy=1.0, num_rays=6)
    np.testing.assert_allclose(np.asarray(h1.y[-1]), np.asarray(h3.y[-1]),
                               rtol=1e-12)


def test_zernike_coeff_variable():
    from optiland_tpu.optimization import OptimizationProblem

    lens = Optic("Z")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     surface_type="zernike", coefficients=(0.0, 0.0, 0.001),
                     norm_radius=12.0, is_stop=True)
    lens.add_surface(index=2, radius=-50.0, thickness=45.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.55, is_primary=True)

    prob = OptimizationProblem()
    prob.add_operand("f2", target=50.0, weight=1.0)
    prob.add_variable(lens, "zernike_coeff", surface_number=1,
                      coeff_number=2)
    v = prob.variables[0]
    static, params = lens.build()
    # offset 1 skips the packed norm_radius slot
    assert float(v.get(params)) == pytest.approx(0.001)
    params2 = v.set(params, 0.005)
    assert float(v.get(params2)) == pytest.approx(0.005)
    # norm_radius variable reads slot 0
    prob.add_variable(lens, "norm_radius", surface_number=1)
    assert float(prob.variables[1].get(params)) == pytest.approx(12.0)


def test_orthogonal_descent_reduces_merit():
    from optiland_tpu.optimization import (
        OptimizationProblem,
        OrthogonalDescent,
    )

    lens = CookeTriplet()
    prob = OptimizationProblem()
    prob.add_operand("f2", target=55.0, weight=1.0)
    prob.add_variable(lens, "radius", surface_number=1)
    before = float(prob.sum_squared())
    OrthogonalDescent(prob).optimize(max_iter=5)
    after = float(prob.sum_squared())
    assert after < before * 0.01


def test_shgo_optimizer():
    from optiland_tpu.optimization import SHGO, OptimizationProblem

    lens = CookeTriplet()
    prob = OptimizationProblem()
    prob.add_operand("f2", target=52.0, weight=1.0)
    prob.add_variable(lens, "radius", surface_number=1,
                      min_val=18.0, max_val=26.0)
    before = float(prob.sum_squared())
    SHGO(prob).optimize(n=32)
    after = float(prob.sum_squared())
    assert after < before


# ---------------------------------------------------------------------------
# round-5: per-geometry flip semantics (reference tests/test_flip_geometries)
# ---------------------------------------------------------------------------
def _flip_lens(**surf1):
    import math

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, thickness=5.0, material=1.5, is_stop=True,
                     **surf1)
    lens.add_surface(index=2, radius=-40.0, thickness=50.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=8.0)
    lens.set_field_type("angle")
    lens.add_field(y=0.0)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


def test_flip_negates_radius_keeps_conic_and_coeffs():
    """Reference `newton_raphson.py:66-72`: flip negates the radius; conic
    and polynomial coefficients are unchanged."""
    lens = _flip_lens(radius=30.0, conic=-0.5,
                      surface_type="even_asphere",
                      coefficients=(1e-4, -2e-6))
    lens.flip()
    # the asphere is now the LAST inner surface (order reversed)
    s = lens.surfaces.specs[2]
    assert s.radius == -30.0
    assert s.conic == -0.5
    assert s.coefficients == (1e-4, -2e-6)


def test_flip_toroidal_negates_rotation_radius():
    lens = _flip_lens(radius=100.0, surface_type="toroidal",
                      radius_y=40.0, coeffs_poly_y=(1e-5,))
    lens.flip()
    s = lens.surfaces.specs[2]
    assert s.radius == -100.0
    assert s.geom_params["radius_y"] == -40.0
    # polynomial coefficients unchanged (reference toroidal flip)
    assert tuple(s.geom_params["coeffs_poly_y"]) == (1e-5,)


def test_flip_biconic_negates_both_radii():
    lens = _flip_lens(radius=60.0, surface_type="biconic",
                      radius_y=-90.0, conic_y=0.2)
    lens.flip()
    s = lens.surfaces.specs[2]
    assert s.radius == -60.0
    assert s.geom_params["radius_y"] == 90.0


def test_flip_grid_sag_negates_table():
    import numpy as np

    xg = np.linspace(-3, 3, 7)
    Z = 1e-3 * np.add.outer(xg**2, xg**2)
    lens = _flip_lens(radius=np.inf, surface_type="grid_sag",
                      x_coordinates=xg, y_coordinates=xg, sag_values=Z)
    lens.flip()
    s = lens.surfaces.specs[2]
    np.testing.assert_allclose(np.asarray(s.geom_params["sag_values"]), -Z)


def test_double_flip_is_identity():
    import numpy as np

    lens = _flip_lens(radius=30.0, conic=-0.5,
                      surface_type="even_asphere",
                      coefficients=(1e-4, -2e-6))
    h0 = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
    y0 = np.asarray(h0.y[-1])
    lens.flip()
    lens.flip()
    h1 = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
    np.testing.assert_allclose(np.asarray(h1.y[-1]), y0, atol=1e-12)
