"""Ray-physics edge cases + physical-aperture boolean algebra (VERDICT r4
item 3): TIR at the critical angle, clip-keeps-tracing semantics, grazing
and normal incidence, vignetting factors, evanescent grating orders, and
the full union/intersection/difference aperture algebra (reference
`physical_apertures/base.py:30-340`, `rays/real_rays.py:154-205`)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.core import rays as R
from optiland_tpu.system.apertures import (DifferenceAperture,
                                           EllipticalAperture,
                                           IntersectionAperture,
                                           OffsetRadialAperture,
                                           PolygonAperture, RadialAperture,
                                           RectangularAperture,
                                           UnionAperture)


def _ray(L=0.0, M=0.0, N=1.0, i=1.0):
    mk = lambda v: jnp.asarray([float(v)])  # noqa: E731
    return R.Rays(x=mk(0), y=mk(0), z=mk(0), L=mk(L), M=mk(M), N=mk(N),
                  i=mk(i), opd=mk(0), w=mk(0.55))


# ---------------------------------------------------------------------------
# refraction / TIR
# ---------------------------------------------------------------------------
class TestRefractEdges:
    def test_normal_incidence_direction_unchanged(self):
        r = R.refract(_ray(), 0.0, 0.0, -1.0, 1.0, 1.5)
        np.testing.assert_allclose(
            [float(r.L[0]), float(r.M[0]), float(r.N[0])], [0, 0, 1],
            atol=1e-14)
        assert float(r.i[0]) == 1.0

    def test_snells_law_exact_angle(self):
        # 30 degrees in glass->air: sin(out) = 1.5 sin(30) = 0.75
        th = math.radians(30.0)
        r = R.refract(_ray(L=math.sin(th), N=math.cos(th)),
                      0.0, 0.0, -1.0, 1.5, 1.0)
        np.testing.assert_allclose(float(r.L[0]), 0.75, rtol=1e-12)
        np.testing.assert_allclose(
            float(r.L[0]) ** 2 + float(r.N[0]) ** 2, 1.0, rtol=1e-12)

    def test_critical_angle_boundary(self):
        # glass (1.5) -> air: critical angle asin(1/1.5)
        th_c = math.asin(1.0 / 1.5)
        just_below = th_c - 1e-6
        just_above = th_c + 1e-6
        r1 = R.refract(_ray(L=math.sin(just_below), N=math.cos(just_below)),
                       0.0, 0.0, -1.0, 1.5, 1.0)
        r2 = R.refract(_ray(L=math.sin(just_above), N=math.cos(just_above)),
                       0.0, 0.0, -1.0, 1.5, 1.0)
        assert float(r1.i[0]) == 1.0          # transmits
        assert float(r2.i[0]) == 0.0          # TIR: clipped
        # TIR ray keeps its direction (no NaN) so downstream math stays clean
        assert np.isfinite([float(r2.L[0]), float(r2.N[0])]).all()

    def test_tir_gradient_is_finite(self):
        # gradient through a TIR-masked refraction must not be NaN
        def f(l0):
            n = jnp.sqrt(1.0 - l0 * l0)
            r = R.refract(_ray(), 0.0, 0.0, -1.0, 1.5, 1.0)
            r = r.replace(L=jnp.asarray([l0]), N=jnp.asarray([n]))
            out = R.refract(r, 0.0, 0.0, -1.0, 1.5, 1.0)
            return jnp.sum(out.L + out.N)

        g_tir = jax.grad(f)(0.9)   # above critical angle (sin th_c = 2/3)
        g_ok = jax.grad(f)(0.3)
        assert np.isfinite(float(g_tir)) and np.isfinite(float(g_ok))

    def test_refract_preserves_unit_norm(self):
        rng = np.random.default_rng(0)
        L = rng.uniform(-0.5, 0.5, 64)
        M = rng.uniform(-0.5, 0.5, 64)
        N = np.sqrt(1 - L**2 - M**2)
        r = R.Rays(x=jnp.zeros(64), y=jnp.zeros(64), z=jnp.zeros(64),
                   L=jnp.asarray(L), M=jnp.asarray(M), N=jnp.asarray(N),
                   i=jnp.ones(64), opd=jnp.zeros(64), w=jnp.full(64, 0.55))
        nv = np.array([0.1, -0.2, -0.97])
        nv /= np.linalg.norm(nv)
        out = R.refract(r, nv[0], nv[1], nv[2], 1.0, 1.62)
        norm = np.asarray(out.L)**2 + np.asarray(out.M)**2 + np.asarray(out.N)**2
        np.testing.assert_allclose(norm, 1.0, rtol=1e-10)

    def test_parity_vs_reference_refract(self, reference):
        from optiland.rays import RealRays

        rng = np.random.default_rng(3)
        n = 50
        L = rng.uniform(-0.6, 0.6, n)
        M = rng.uniform(-0.6, 0.6, n)
        N = np.sqrt(1 - L**2 - M**2)
        ref = RealRays(np.zeros(n), np.zeros(n), np.zeros(n), L.copy(),
                       M.copy(), N.copy(), np.ones(n), np.full(n, 0.55))
        nz = -np.ones(n)
        ref.refract(np.zeros(n), np.zeros(n), nz, 1.0, 1.62)
        mine = R.refract(
            R.Rays(x=jnp.zeros(n), y=jnp.zeros(n), z=jnp.zeros(n),
                   L=jnp.asarray(L), M=jnp.asarray(M), N=jnp.asarray(N),
                   i=jnp.ones(n), opd=jnp.zeros(n), w=jnp.full(n, 0.55)),
            jnp.zeros(n), jnp.zeros(n), jnp.asarray(nz), 1.0, 1.62)
        np.testing.assert_allclose(np.asarray(mine.L), np.asarray(ref.L),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(mine.N), np.asarray(ref.N),
                                   rtol=1e-12, atol=1e-14)


class TestReflectEdges:
    def test_normal_incidence_reverses(self):
        r = R.reflect(_ray(), 0.0, 0.0, -1.0)
        np.testing.assert_allclose(float(r.N[0]), -1.0, rtol=1e-14)

    def test_45deg_fold(self):
        # 45-degree mirror: +z ray becomes +y ray
        s = 1 / math.sqrt(2)
        r = R.reflect(_ray(), 0.0, s, -s)
        np.testing.assert_allclose(
            [float(r.L[0]), float(r.M[0]), float(r.N[0])], [0, 1, 0],
            atol=1e-14)

    def test_reflection_angle_equals_incidence(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            L = rng.uniform(-0.7, 0.7)
            N = math.sqrt(1 - L * L)
            out = R.reflect(_ray(L=L, N=N), 0.0, 0.0, -1.0)
            np.testing.assert_allclose(float(out.L[0]), L, rtol=1e-12)
            np.testing.assert_allclose(float(out.N[0]), -N, rtol=1e-12)


class TestClipSemantics:
    def test_clip_zeroes_intensity_keeps_coords(self):
        r = _ray()
        out = R.clip(r, jnp.asarray([True]))
        assert float(out.i[0]) == 0.0
        # position/direction untouched: the ray keeps tracing (reference
        # `real_rays.py:154-161` semantics, load-bearing for centroid math)
        assert float(out.N[0]) == 1.0 and float(out.z[0]) == 0.0

    def test_clipped_ray_still_propagates(self):
        r = R.clip(_ray(), jnp.asarray([True]))
        out = R.propagate(r, jnp.asarray([5.0]))
        np.testing.assert_allclose(float(out.z[0]), 5.0)
        assert float(out.i[0]) == 0.0

    def test_clip_false_is_identity(self):
        r = _ray(i=0.7)
        out = R.clip(r, jnp.asarray([False]))
        assert float(out.i[0]) == 0.7


class TestGratingEdges:
    def test_zero_order_is_refraction(self):
        # m = 0: grating equation reduces to Snell
        th = math.radians(20)
        ray = _ray(L=math.sin(th), N=math.cos(th))
        d = R.grating_diffract(ray, 0.0, 0.0, -1.0, 0.0, 1.0, 0.0,
                               0.0, 10.0, 1.0, 1.5, False)
        s = R.refract(ray, 0.0, 0.0, -1.0, 1.0, 1.5)
        np.testing.assert_allclose(float(d.L[0]), float(s.L[0]), rtol=1e-10)
        np.testing.assert_allclose(float(d.N[0]), float(s.N[0]), rtol=1e-10)

    def test_littrow_angle_first_order(self):
        # reflective grating at normal incidence: sin(out) = m w / d
        m, d, w = 1.0, 2.0, 0.55
        out = R.grating_diffract(_ray(), 0.0, 0.0, -1.0, 1.0, 0.0, 0.0,
                                 m, d, 1.0, 1.0, True)
        np.testing.assert_allclose(abs(float(out.L[0])), w / d, rtol=1e-10)
        # z sign follows the reference's reflective-grating convention
        # (verified identical to `real_rays.py:207-522` output: N > 0, the
        # sequential trace flips direction separately)
        np.testing.assert_allclose(float(out.N[0]),
                                   math.sqrt(1 - (w / d) ** 2), rtol=1e-10)

    def test_evanescent_order_clipped(self):
        # m w / d > 1: no propagating order
        out = R.grating_diffract(_ray(), 0.0, 0.0, -1.0, 1.0, 0.0, 0.0,
                                 3.0, 1.0, 1.0, 1.0, True)
        assert float(out.i[0]) == 0.0
        assert np.isfinite([float(out.L[0]), float(out.N[0])]).all()


# ---------------------------------------------------------------------------
# vignetting factors through the trace
# ---------------------------------------------------------------------------
def test_vignetting_factors_shift_pupil():
    """vy compresses/displaces the pupil sampling: Py' = Py (1 - |vy|) - vy
    (reference `fields/field_group.py:93-123` convention)."""
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    h0 = lens.trace_generic(Hx=0.0, Hy=1.0, Px=0.0, Py=0.5,
                            wavelength=0.55)
    lens.fields.vy[-1] = 0.3
    lens._dirty()
    h1 = lens.trace_generic(Hx=0.0, Hy=1.0, Px=0.0, Py=0.5,
                            wavelength=0.55)
    # vignetted pupil coordinate differs -> different image-plane hit
    assert abs(float(h1.y[-1][0]) - float(h0.y[-1][0])) > 1e-9


# ---------------------------------------------------------------------------
# physical-aperture boolean algebra
# ---------------------------------------------------------------------------
def _pts():
    g = np.linspace(-3, 3, 25)
    X, Y = np.meshgrid(g, g)
    return jnp.asarray(X.ravel()), jnp.asarray(Y.ravel())


class TestApertureAlgebra:
    def test_radial_annulus(self):
        ap = RadialAperture(r_max=2.0, r_min=1.0)
        x, y = _pts()
        got = np.asarray(ap.contains(x, y))
        r = np.hypot(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(got, (r <= 2.0) & (r >= 1.0))

    def test_union_is_or(self):
        a = RadialAperture(r_max=1.0)
        b = OffsetRadialAperture(r_max=1.0, offset_x=1.5)
        x, y = _pts()
        got = np.asarray((a | b).contains(x, y))
        np.testing.assert_array_equal(
            got, np.asarray(a.contains(x, y)) | np.asarray(b.contains(x, y)))
        assert isinstance(a | b, UnionAperture)

    def test_intersection_is_and(self):
        a = RectangularAperture(-2, 2, -1, 1)
        b = RadialAperture(r_max=1.5)
        x, y = _pts()
        got = np.asarray((a & b).contains(x, y))
        np.testing.assert_array_equal(
            got, np.asarray(a.contains(x, y)) & np.asarray(b.contains(x, y)))
        assert isinstance(a & b, IntersectionAperture)

    def test_difference_is_andnot(self):
        a = RadialAperture(r_max=2.0)
        b = RadialAperture(r_max=0.5)
        x, y = _pts()
        got = np.asarray((a - b).contains(x, y))
        np.testing.assert_array_equal(
            got,
            np.asarray(a.contains(x, y)) & ~np.asarray(b.contains(x, y)))
        assert isinstance(a - b, DifferenceAperture)

    def test_demorgan_identity(self):
        # (A | B) - (A & B) == symmetric difference == (A-B) | (B-A)
        a = EllipticalAperture(a=2.0, b=1.0)
        b = RadialAperture(r_max=1.2)
        x, y = _pts()
        lhs = np.asarray(((a | b) - (a & b)).contains(x, y))
        rhs = np.asarray(((a - b) | (b - a)).contains(x, y))
        np.testing.assert_array_equal(lhs, rhs)

    def test_clip_is_complement_of_contains(self):
        ap = PolygonAperture(xs=(-1, 1, 1, -1), ys=(-1, -1, 1, 1))
        x, y = _pts()
        np.testing.assert_array_equal(np.asarray(ap.clip(x, y)),
                                      ~np.asarray(ap.contains(x, y)))

    def test_polygon_square_matches_rectangle(self):
        sq = PolygonAperture(xs=(-1.5, 1.5, 1.5, -1.5),
                             ys=(-1.0, -1.0, 1.0, 1.0))
        rect = RectangularAperture(-1.5, 1.5, -1.0, 1.0)
        rng = np.random.default_rng(2)
        # stay off the boundary, where edge-inclusion conventions differ
        x = jnp.asarray(rng.uniform(-2.5, 2.5, 200))
        y = jnp.asarray(rng.uniform(-2.5, 2.5, 200))
        np.testing.assert_array_equal(np.asarray(sq.contains(x, y)),
                                      np.asarray(rect.contains(x, y)))

    def test_extent_composition(self):
        a = RadialAperture(r_max=1.0)
        b = OffsetRadialAperture(r_max=1.0, offset_x=2.0)
        assert (a | b).extent == (-1.0, 3.0, -1.0, 1.0)
        assert (a - b).extent == a.extent

    def test_parity_vs_reference_boolean(self, reference):
        from optiland.physical_apertures import (RadialAperture as RefRad,
                                                 RectangularAperture
                                                 as RefRect)

        a_ref = RefRad(r_max=1.8, r_min=0.4)
        b_ref = RefRect(-1.0, 1.0, -2.0, 2.0)
        a = RadialAperture(r_max=1.8, r_min=0.4)
        b = RectangularAperture(-1.0, 1.0, -2.0, 2.0)
        x, y = _pts()
        for mine, ref in (((a | b), a_ref | b_ref),
                          ((a & b), a_ref & b_ref),
                          ((a - b), a_ref - b_ref)):
            np.testing.assert_array_equal(
                np.asarray(mine.contains(x, y)),
                np.asarray(ref.contains(np.asarray(x), np.asarray(y))))

    def test_aperture_mask_in_trace_clips_rays(self):
        """A rectangular mask on the stop surface kills exactly the rays
        whose stop-plane hit is outside it — and they keep tracing."""
        from optiland_tpu.models import CookeTriplet

        lens = CookeTriplet()
        h0 = lens.trace(Hx=0.0, Hy=0.0, num_rays=48,
                        distribution="hexapolar")
        alive0 = int(np.sum(np.asarray(h0.intensity[-1]) > 0))
        lens.surfaces.specs[4].semi_aperture = RectangularAperture(
            -2.0, 2.0, -0.8, 0.8)
        lens._dirty()
        h1 = lens.trace(Hx=0.0, Hy=0.0, num_rays=48,
                        distribution="hexapolar")
        alive1 = int(np.sum(np.asarray(h1.intensity[-1]) > 0))
        assert 0 < alive1 < alive0
        # clipped rays still have finite coordinates at the image plane
        assert np.isfinite(np.asarray(h1.y[-1])).all()
