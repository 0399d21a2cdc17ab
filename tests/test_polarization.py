"""Polarization parity vs the reference: PRT matrices, Jones elements,
Fresnel coatings, polarized intensity through sample lenses."""

import numpy as np
import pytest

import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.polarization import PolarizationState, jones as J, prt


def _dirs(n=16, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.uniform(-0.3, 0.3, n)
    M = rng.uniform(-0.3, 0.3, n)
    N = np.sqrt(1 - L**2 - M**2)
    k0 = np.stack([L, M, N], axis=1)
    # a slightly bent outgoing direction
    L2 = L + rng.uniform(-0.1, 0.1, n)
    M2 = M + rng.uniform(-0.1, 0.1, n)
    N2 = np.sqrt(1 - L2**2 - M2**2)
    k1 = np.stack([L2, M2, N2], axis=1)
    return k0, k1


def test_local_basis_parity(reference):
    from optiland.rays.polarized_rays import PolarizedRays

    k0, k1 = _dirs()
    s_r, p0_r, p1_r, oin_r, oout_r = PolarizedRays.get_local_basis(k0, k1)
    s, p0, p1, oin, oout = prt.local_basis(jnp.asarray(k0), jnp.asarray(k1))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(oin), np.asarray(oin_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(oout), np.asarray(oout_r), atol=1e-12)


def _ref_rays(reference, k0, k1):
    from optiland.rays import RealRays

    n = k0.shape[0]
    rays = RealRays(np.zeros(n), np.zeros(n), np.zeros(n),
                    k1[:, 0].copy(), k1[:, 1].copy(), k1[:, 2].copy(),
                    np.ones(n), np.full(n, 0.55))
    rays.L0, rays.M0, rays.N0 = k0[:, 0], k0[:, 1], k0[:, 2]
    return rays


@pytest.mark.parametrize("case", ["fresnel_t", "fresnel_r", "pol_h", "pol_v",
                                  "rcp", "lcp", "retarder", "diattenuator"])
def test_jones_parity(case, reference):
    import optiland.jones as rj
    from optiland.materials import IdealMaterial

    k0, k1 = _dirs(seed=4)
    rays = _ref_rays(reference, k0, k1)
    aoi = np.arccos(np.clip(np.abs(k0[:, 2]), -1, 1))

    if case in ("fresnel_t", "fresnel_r"):
        reflect = case.endswith("_r")
        ref_j = rj.JonesFresnel(IdealMaterial(1.0), IdealMaterial(1.52)) \
            .calculate_matrix(rays, reflect=reflect, aoi=aoi)
        got = J.fresnel(jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(aoi),
                        1.0, 1.52, reflect=reflect)
    elif case == "pol_h":
        ref_j = rj.JonesPolarizerH().calculate_matrix(rays)
        got = J.polarizer_h(jnp.asarray(k0), jnp.asarray(k1))
    elif case == "pol_v":
        ref_j = rj.JonesPolarizerV().calculate_matrix(rays)
        got = J.polarizer_v(jnp.asarray(k0), jnp.asarray(k1))
    elif case == "rcp":
        ref_j = rj.JonesPolarizerRCP().calculate_matrix(rays)
        got = J.polarizer_rcp(jnp.asarray(k0), jnp.asarray(k1))
    elif case == "lcp":
        ref_j = rj.JonesPolarizerLCP().calculate_matrix(rays)
        got = J.polarizer_lcp(jnp.asarray(k0), jnp.asarray(k1))
    elif case == "retarder":
        ref_j = rj.JonesLinearRetarder(0.7, theta=0.4).calculate_matrix(rays)
        axis = [np.cos(0.4), np.sin(0.4), 0.0]
        got = J.linear_retarder(jnp.asarray(k0), jnp.asarray(k1), 0.7, axis)
    else:
        ref_j = rj.JonesLinearDiattenuator(0.2, 0.9, theta=0.3) \
            .calculate_matrix(rays)
        axis = [np.cos(0.3), np.sin(0.3), 0.0]
        got = J.linear_diattenuator(jnp.asarray(k0), jnp.asarray(k1), 0.2,
                                    0.9, axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_j),
                               rtol=1e-9, atol=1e-12)


def test_polarized_trace_intensity_parity(reference):
    """Full polarized trace with default Fresnel-free surfaces: intensity
    parity vs the reference's PolarizedRays pipeline on the Cooke triplet."""
    from optiland.rays.polarization_state import PolarizationState as RefState
    from optiland.samples.objectives import CookeTriplet as RefCooke

    from optiland_tpu.models import CookeTriplet

    ref = RefCooke()
    ref.polarization = RefState(is_polarized=True, Ex=1.0, Ey=0.0,
                                phase_x=0.0, phase_y=0.0)
    ref_rays = ref.trace(Hx=0.0, Hy=0.7, wavelength=0.55, num_rays=4,
                         distribution="hexapolar")
    # the polarized intensity lives on the returned rays (the reference's
    # in-place write to the stacked `surfaces.intensity` property is a no-op)
    ref_i = np.asarray(ref_rays.i)

    lens = CookeTriplet()
    lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
    hist = lens.trace(Hx=0.0, Hy=0.7, wavelength=0.55, num_rays=4)
    got_i = np.asarray(hist.intensity[-1])
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-8, atol=1e-10)


def test_polarized_trace_with_fresnel_coating(reference):
    """Fresnel-coated singlet: polarized intensity parity vs reference."""
    import optiland
    from optiland.rays.polarization_state import PolarizationState as RefState

    ref = optiland.optic.Optic()
    ref.add_surface(index=0, radius=np.inf, thickness=np.inf)
    ref.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                    is_stop=True, coating="fresnel")
    ref.add_surface(index=2, radius=-50.0, thickness=47.0, coating="fresnel")
    ref.add_surface(index=3)
    ref.set_aperture(aperture_type="EPD", value=10.0)
    ref.set_field_type(field_type="angle")
    ref.add_field(y=0)
    ref.add_wavelength(value=0.55, is_primary=True)
    ref.polarization = RefState(is_polarized=True, Ex=0.6, Ey=0.8,
                                phase_x=0.0, phase_y=0.5)
    ref_rays = ref.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4,
                         distribution="hexapolar")
    ref_i = np.asarray(ref_rays.i)

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True, coating="fresnel")
    lens.add_surface(index=2, radius=-50.0, thickness=47.0, coating="fresnel")
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)
    lens.set_polarization(PolarizationState(True, 0.6, 0.8, 0.0, 0.5))
    hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4)
    got_i = np.asarray(hist.intensity[-1])
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-8, atol=1e-10)


def test_unpolarized_state_trace():
    """Unpolarized light = incoherent average of two orthogonal states."""
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    lens.set_polarization("unpolarized")
    hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=3)
    i = np.asarray(hist.intensity[-1])
    assert np.all(np.isfinite(i))
    assert np.all(i > 0.9)  # lossless surfaces, near-unit transmission


def test_simple_coating_scales_intensity():
    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     is_stop=True, coating=("simple", 0.5, 0.0))
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.add_wavelength(0.55, is_primary=True)
    hist = lens.trace(num_rays=3)
    np.testing.assert_allclose(np.asarray(hist.intensity[-1]), 0.5)


def test_polarized_trace_with_thin_film_coating(reference):
    """TMM-backed ThinFilmCoating on a singlet: polarized intensity parity
    vs the reference (`optiland/coatings.py:488-605`)."""
    from optiland import coatings as ref_coatings
    from optiland import materials as ref_materials
    from optiland.rays.polarization_state import PolarizationState as RefState

    air = ref_materials.IdealMaterial(n=1.0)
    glass = ref_materials.IdealMaterial(n=1.5)
    mgf2 = ref_materials.IdealMaterial(n=1.38)

    def ref_coat():
        return ref_coatings.ThinFilmCoating(
            material_pre=air, material_post=glass,
            layers=[(mgf2, 100.0, "MgF2")])

    from optiland.optic import Optic as RefOptic

    ref = RefOptic()
    ref.add_surface(index=0, radius=np.inf, thickness=np.inf)
    ref.add_surface(index=1, radius=50.0, thickness=5.0, material=glass,
                    is_stop=True, coating=ref_coat())
    ref.add_surface(index=2, radius=-50.0, thickness=47.0)
    ref.add_surface(index=3)
    ref.set_aperture(aperture_type="EPD", value=10.0)
    ref.set_field_type(field_type="angle")
    ref.add_field(y=0)
    ref.add_wavelength(value=0.55, is_primary=True)
    ref.polarization = RefState(is_polarized=True, Ex=0.6, Ey=0.8,
                                phase_x=0.0, phase_y=0.5)
    ref_rays = ref.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4,
                         distribution="hexapolar")
    ref_i = np.asarray(ref_rays.i)

    from optiland_tpu.system.optic import Optic
    from optiland_tpu.thin_film.stack import ThinFilmStack

    stack = ThinFilmStack(1.0, 1.5).add_layer_nm(1.38, 100.0)
    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     is_stop=True, coating=stack)
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)
    lens.set_polarization(PolarizationState(True, 0.6, 0.8, 0.0, 0.5))
    hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4)
    got_i = np.asarray(hist.intensity[-1])
    # the coating visibly attenuates (not a no-op) and matches the reference
    assert np.all(got_i < 1.0)
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-8, atol=1e-10)


def test_thin_film_coating_reflective_parity(reference):
    """ThinFilmCoating on a mirror: R-side Jones parity vs reference."""
    from optiland import coatings as ref_coatings
    from optiland import materials as ref_materials
    from optiland.rays.polarization_state import PolarizationState as RefState

    air = ref_materials.IdealMaterial(n=1.0)
    mgf2 = ref_materials.IdealMaterial(n=1.38)

    from optiland.optic import Optic as RefOptic

    ref = RefOptic()
    ref.add_surface(index=0, radius=np.inf, thickness=np.inf)
    ref.add_surface(index=1, radius=-100.0, material="mirror", is_stop=True,
                    thickness=-40.0,
                    coating=ref_coatings.ThinFilmCoating(
                        material_pre=air, material_post=air,
                        layers=[(mgf2, 120.0, "L1")]))
    ref.add_surface(index=2, radius=np.inf, thickness=0.0)
    ref.add_surface(index=3)
    ref.set_aperture(aperture_type="EPD", value=10.0)
    ref.set_field_type(field_type="angle")
    ref.add_field(y=0)
    ref.add_wavelength(value=0.55, is_primary=True)
    ref.polarization = RefState(is_polarized=True, Ex=1.0, Ey=0.0,
                                phase_x=0.0, phase_y=0.0)
    ref_rays = ref.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4,
                         distribution="hexapolar")
    ref_i = np.asarray(ref_rays.i)

    from optiland_tpu.system.optic import Optic
    from optiland_tpu.thin_film.stack import ThinFilmStack

    stack = ThinFilmStack(1.0, 1.0).add_layer_nm(1.38, 120.0)
    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=-100.0, material="mirror", is_stop=True,
                     thickness=-40.0, coating=stack)
    lens.add_surface(index=2, radius=np.inf, thickness=0.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)
    lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
    hist = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.55, num_rays=4)
    got_i = np.asarray(hist.intensity[-1])
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-8, atol=1e-10)
