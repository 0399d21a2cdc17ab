"""First-order optics golden suite (VERDICT r4 item 3): closed-form
textbook systems whose paraxial properties are known exactly — thin lens,
lensmaker thick lens, two-thin-lens combination, afocal telescope,
magnification/Lagrange invariant — plus Seidel-aberration parity vs the
mounted reference (`optiland/paraxial.py`, `aberrations.py`)."""

import math

import numpy as np
import pytest

from optiland_tpu import Optic
from optiland_tpu.system import paraxial as px


def _lens_from(surfs, aperture=("EPD", 10.0), field_y=0.0, wl=0.55):
    lens = Optic()
    for kw in surfs:
        lens.add_surface(**kw)
    lens.set_aperture(aperture_type=aperture[0], value=aperture[1])
    lens.set_field_type("angle")
    lens.add_field(y=field_y)
    lens.add_wavelength(value=wl, is_primary=True)
    return lens


def _thick_lens(R1, R2, t, n, image_dist=100.0):
    return _lens_from([
        dict(index=0, radius=np.inf, thickness=np.inf),
        dict(index=1, radius=R1, thickness=t, material=n, is_stop=True),
        dict(index=2, radius=R2, thickness=image_dist),
        dict(index=3),
    ])


class TestLensmaker:
    @pytest.mark.parametrize("R1,R2,t,n", [
        (50.0, -50.0, 4.0, 1.5),
        (100.0, np.inf, 5.0, 1.62),
        (np.inf, -80.0, 3.0, 1.7),
        (30.0, 60.0, 6.0, 1.52),
    ])
    def test_efl_matches_lensmaker_equation(self, R1, R2, t, n):
        # 1/f = (n-1) [1/R1 - 1/R2 + (n-1) t / (n R1 R2)]
        c1 = 0.0 if math.isinf(R1) else 1.0 / R1
        c2 = 0.0 if math.isinf(R2) else 1.0 / R2
        inv_f = (n - 1.0) * (c1 - c2 + (n - 1.0) * t * c1 * c2 / n)
        lens = _thick_lens(R1, R2, t, n)
        np.testing.assert_allclose(float(lens.paraxial.f2()), 1.0 / inv_f,
                                   rtol=1e-10)

    def test_biconvex_principal_planes(self):
        # symmetric biconvex: principal planes symmetric about the center
        R, t, n = 50.0, 6.0, 1.5
        lens = _thick_lens(R, -R, t, n)
        static, params = lens.build()
        f = float(px.f2(static, params))
        # P2 offset from the rear vertex: -f (n-1) t / (R n).
        # px.P2 is referenced to the IMAGE surface (reference convention);
        # the rear vertex sits image_dist=100 before it.
        want_p2 = -f * (n - 1.0) * t / (R * n)
        p2 = float(px.P2(static, params)) + 100.0
        np.testing.assert_allclose(p2, want_p2, rtol=1e-9)

    def test_plano_convex_focal_distance(self):
        # curved side first, flat to image: BFD = f - t/n exactly
        R, t, n = 40.0, 5.0, 1.6
        lens = _thick_lens(R, np.inf, t, n)
        static, params = lens.build()
        f = float(px.f2(static, params))
        np.testing.assert_allclose(f, R / (n - 1.0), rtol=1e-12)
        # F2 is referenced to the image surface; the rear vertex sits
        # image_dist=100 before it, so BFD = F2 + 100
        bfd = float(px.F2(static, params)) + 100.0
        np.testing.assert_allclose(bfd, f - t / n, rtol=1e-10)


class TestThinLensCombos:
    def test_two_thin_lenses(self):
        # 1/f = 1/f1 + 1/f2 - d/(f1 f2) using paraxial (ideal) surfaces
        f1_, f2_, d = 100.0, 50.0, 20.0
        lens = _lens_from([
            dict(index=0, radius=np.inf, thickness=np.inf),
            dict(index=1, surface_type="paraxial", f=f1_,
                 thickness=d, is_stop=True),
            dict(index=2, surface_type="paraxial", f=f2_,
                 thickness=40.0),
            dict(index=3),
        ])
        want = 1.0 / (1 / f1_ + 1 / f2_ - d / (f1_ * f2_))
        np.testing.assert_allclose(float(lens.paraxial.f2()), want,
                                   rtol=1e-10)

    def test_afocal_telescope_infinite_efl(self):
        # Keplerian telescope: separation f1 + f2 -> afocal (EFL diverges)
        f1_, f2_ = 100.0, 25.0
        lens = _lens_from([
            dict(index=0, radius=np.inf, thickness=np.inf),
            dict(index=1, surface_type="paraxial", f=f1_,
                 thickness=f1_ + f2_, is_stop=True),
            dict(index=2, surface_type="paraxial", f=f2_,
                 thickness=10.0),
            dict(index=3),
        ])
        assert abs(float(lens.paraxial.f2())) > 1e6

    def test_fno_definition(self):
        lens = _thick_lens(50.0, -50.0, 4.0, 1.5)
        static, params = lens.build()
        f = float(px.f2(static, params))
        epd = float(px.EPD(static, params))
        np.testing.assert_allclose(float(px.FNO(static, params)), f / epd,
                                   rtol=1e-10)


class TestPupilsAndInvariant:
    def test_stop_at_lens_pupils_at_lens(self):
        # stop on the (thin) lens: EP and XP coincide with it
        lens = _lens_from([
            dict(index=0, radius=np.inf, thickness=np.inf),
            dict(index=1, surface_type="paraxial", f=80.0,
                 thickness=80.0, is_stop=True),
            dict(index=2),
        ])
        static, params = lens.build()
        np.testing.assert_allclose(float(px.EPL(static, params)), 0.0,
                                   atol=1e-9)
        np.testing.assert_allclose(float(px.EPD(static, params)), 10.0,
                                   rtol=1e-12)

    def test_stop_behind_lens_entrance_pupil_is_image_of_stop(self):
        # thin lens f, stop a distance d behind: EP at the stop's image
        f, d = 60.0, 20.0
        lens = _lens_from([
            dict(index=0, radius=np.inf, thickness=np.inf),
            dict(index=1, surface_type="paraxial", f=f,
                 thickness=d),
            dict(index=2, radius=np.inf, thickness=100.0, is_stop=True),
            dict(index=3),
        ])
        static, params = lens.build()
        # image of the stop through the lens, imaged backward:
        # 1/z' = 1/(-d) + ... : z_ep = -d f / (d - f) measured from the lens
        z_ep = d * f / (f - d)  # +z side when d < f... sign check below
        epl = float(px.EPL(static, params))
        np.testing.assert_allclose(epl, -z_ep * -1.0
                                   if False else f * d / (f - d),
                                   rtol=1e-9)

    def test_lagrange_invariant_conserved(self):
        from optiland_tpu.models import CookeTriplet

        lens = CookeTriplet()
        static, params = lens.build()
        inv = float(px.invariant(static, params))
        # recompute at an arbitrary interior surface: n u ybar - n ubar y
        my, mu = px.marginal_ray(static, params)
        cy, cu = px.chief_ray(static, params)
        n = np.asarray(px.index_table(static, params,
                                      lens.primary_wavelength))
        my, mu = np.asarray(my), np.asarray(mu)
        cy, cu = np.asarray(cy), np.asarray(cu)
        for k in (1, 3, 5):
            ik = n[k] * (mu[k] * cy[k] - cu[k] * my[k])
            np.testing.assert_allclose(ik, inv, rtol=1e-8)

    def test_magnification_finite_conjugates(self):
        # 2f-2f imaging with a thin lens: m = -1
        f = 50.0
        lens = _lens_from([
            dict(index=0, radius=np.inf, thickness=2 * f),
            dict(index=1, surface_type="paraxial", f=f,
                 thickness=2 * f, is_stop=True),
            dict(index=2),
        ])
        lens.set_field_type("object_height")
        static, params = lens.build()
        np.testing.assert_allclose(float(px.magnification(static, params)),
                                   -1.0, rtol=1e-9)


class TestSeidelParity:
    @pytest.fixture(scope="class")
    def pair(self, reference):
        import optiland.backend as be

        be.set_backend("numpy")
        from optiland.samples.objectives import CookeTriplet as RefCooke

        from optiland_tpu.models import CookeTriplet

        return RefCooke(), CookeTriplet()

    @pytest.mark.parametrize("name", ["TSC", "CC", "TAC", "TPC", "DC",
                                      "TAchC", "TchC"])
    def test_seidel_sums_match_reference(self, pair, name):
        from optiland_tpu.system import aberrations as ab

        ref, mine = pair
        static, params = mine.build()
        got = np.asarray(getattr(ab, name)(static, params))
        want = np.asarray(getattr(ref.aberrations, name)())
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)

    def test_seidels_vector_matches_reference(self, pair):
        from optiland_tpu.system import aberrations as ab

        ref, mine = pair
        static, params = mine.build()
        got = np.asarray(ab.seidels(static, params))
        want = np.asarray(ref.aberrations.seidels())
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)

    def test_concentric_surface_zero_spherical(self):
        """A refracting surface concentric with the object point (center
        of curvature AT the object) bends every ray normally — it adds no
        spherical aberration, so its TSC term vanishes; a generic bent
        surface at the same power does not."""
        from optiland_tpu.system import aberrations as ab

        # NOTE: the stop must NOT sit on the first surface — for
        # object_height fields both this repo and the reference NaN there
        # (`field_types/object_height.py:90` divides by the reverse unit
        # chief height, which is zero at the stop itself; verified
        # identical behavior).
        def one_surface(R1):
            lens = _lens_from([
                dict(index=0, radius=np.inf, thickness=50.0),
                dict(index=1, radius=R1, thickness=30.0, material=1.5),
                dict(index=2, radius=-40.0, thickness=60.0, is_stop=True),
                dict(index=3),
            ], field_y=2.0)
            lens.set_field_type("object_height")
            s, p = lens.build()
            return np.asarray(ab.TSC(s, p))

        conc = one_surface(-50.0)   # center of curvature at the object
        gen = one_surface(40.0)
        assert abs(conc[0]) < 1e-12
        assert abs(gen[0]) > 1e-6
