"""Geometry golden table — the port of the reference's
`tests/test_geometries.py` tier (110 golden tests; VERDICT r4 item 3).

Three layers per geometry:
  1. analytic golden values (hand-derived closed forms, not regression
     captures) for sag / normal / intersection distance,
  2. intersection self-consistency (the hit point satisfies z == sag(x, y)),
  3. parity vs the mounted reference geometry classes on fixed grids.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.geometry import surfaces as G

F64 = np.float64


def _j(a):
    return jnp.asarray(np.asarray(a, F64))


def sag_np(code, n_coeffs, x, y, cv, k, coeffs, aux=()):
    return np.asarray(G.sag(code, n_coeffs, _j(x), _j(y), cv, k, _j(coeffs),
                            aux))


def normal_np(code, n_coeffs, x, y, cv, k, coeffs, aux=()):
    nx, ny, nz = G.surface_normal(code, n_coeffs, _j(x), _j(y), cv, k,
                                  _j(coeffs), aux)
    return np.asarray(nx), np.asarray(ny), np.asarray(nz)


# ---------------------------------------------------------------------------
# 1. analytic sag goldens
# ---------------------------------------------------------------------------
class TestConicSagGoldens:
    def test_plane_sag_is_zero(self):
        x, y = np.array([0.0, 1.0, -3.0]), np.array([0.0, 2.0, 5.0])
        np.testing.assert_array_equal(
            sag_np(G.GEOM_PLANE, 0, x, y, 0.0, 0.0, np.zeros(1)), 0.0)

    @pytest.mark.parametrize("R,r", [(10.0, 2.0), (10.0, 6.0), (-25.0, 4.0),
                                     (100.0, 30.0)])
    def test_sphere_sag_closed_form(self, R, r):
        # sphere: z = R - sign(R) sqrt(R^2 - r^2)
        want = R - math.copysign(math.sqrt(R * R - r * r), R)
        got = sag_np(G.GEOM_CONIC, 0, np.array([r]), np.array([0.0]),
                     1.0 / R, 0.0, np.zeros(1))[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    @pytest.mark.parametrize("R,r", [(10.0, 3.0), (-50.0, 12.0)])
    def test_parabola_sag_closed_form(self, R, r):
        # k = -1 parabola: z = r^2 / (2R) exactly
        got = sag_np(G.GEOM_CONIC, 0, np.array([0.0]), np.array([r]),
                     1.0 / R, -1.0, np.zeros(1))[0]
        np.testing.assert_allclose(got, r * r / (2 * R), rtol=1e-13)

    @pytest.mark.parametrize("k", [-3.0, -1.5, -0.5, 0.0, 0.8, 2.0])
    def test_general_conic_formula(self, k):
        # z = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2))
        cv, r = 1.0 / 40.0, 7.0
        want = cv * r * r / (1 + math.sqrt(1 - (1 + k) * cv * cv * r * r))
        got = sag_np(G.GEOM_CONIC, 0, np.array([r * 0.6]),
                     np.array([r * 0.8]), cv, k, np.zeros(1))[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    def test_sag_rotationally_symmetric(self):
        th = np.linspace(0, 2 * np.pi, 13)
        r = 5.0
        got = sag_np(G.GEOM_CONIC, 0, r * np.cos(th), r * np.sin(th),
                     1 / 30.0, -0.7, np.zeros(1))
        np.testing.assert_allclose(got, got[0], rtol=1e-13)


class TestAsphereSagGoldens:
    def test_even_asphere_sum(self):
        cv, k = 1 / 25.0, -0.5
        C = np.array([1e-4, -2e-6, 3e-8])
        r = 4.0
        conic = cv * r**2 / (1 + math.sqrt(1 - (1 + k) * cv**2 * r**2))
        want = conic + C[0] * r**2 + C[1] * r**4 + C[2] * r**6
        got = sag_np(G.GEOM_EVEN_ASPHERE, 3, np.array([0.0]), np.array([r]),
                     cv, k, C)[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    def test_odd_asphere_sum(self):
        cv, k = 1 / 25.0, 0.0
        C = np.array([1e-3, -1e-4, 1e-5])
        r = 3.0
        conic = cv * r**2 / (1 + math.sqrt(1 - cv**2 * r**2))
        want = conic + C[0] * r + C[1] * r**2 + C[2] * r**3
        got = sag_np(G.GEOM_ODD_ASPHERE, 3, np.array([r]), np.array([0.0]),
                     cv, k, C)[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    def test_zero_coeffs_reduce_to_conic(self):
        x = np.linspace(-5, 5, 11)
        y = np.linspace(-4, 4, 11)
        conic = sag_np(G.GEOM_CONIC, 0, x, y, 1 / 30.0, -0.2, np.zeros(1))
        for code in (G.GEOM_EVEN_ASPHERE, G.GEOM_ODD_ASPHERE):
            got = sag_np(code, 0, x, y, 1 / 30.0, -0.2, np.zeros(1))
            np.testing.assert_allclose(got, conic, rtol=1e-14)


class TestFreeformSagGoldens:
    def test_polynomial_xy_exact(self):
        # order-2 grid C[i, j] x^i y^j flattened row-major
        Cm = np.zeros((3, 3))
        Cm[0, 1] = 0.1   # y
        Cm[1, 0] = -0.2  # x
        Cm[1, 1] = 0.05  # xy
        Cm[2, 0] = 1e-3  # x^2
        x, y = 1.5, -2.0
        want = 0.1 * y - 0.2 * x + 0.05 * x * y + 1e-3 * x * x
        got = sag_np(G.GEOM_POLYNOMIAL_XY, 9, np.array([x]), np.array([y]),
                     0.0, 0.0, Cm.ravel())[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    def test_biconic_exact(self):
        Rx, Ry = 50.0, -80.0
        kx, ky = -0.3, 0.4
        x, y = 3.0, 4.0
        zx = (x * x / Rx) / (1 + math.sqrt(1 - (1 + kx) * x * x / Rx**2))
        zy = (y * y / Ry) / (1 + math.sqrt(1 - (1 + ky) * y * y / Ry**2))
        got = sag_np(G.GEOM_BICONIC, 2, np.array([x]), np.array([y]),
                     1 / Rx, kx, np.array([1 / Ry, ky]))[0]
        np.testing.assert_allclose(got, zx + zy, rtol=1e-13)

    def test_toroidal_sweep_exact(self):
        # toroid: y-curve z_y(y) swept about an axis parallel to x at
        # height R_rot: z = R - sqrt((R - z_y)^2 - x^2)
        R_rot, Ry = 100.0, 40.0
        x, y = 5.0, 6.0
        z_y = (y * y / Ry) / (1 + math.sqrt(1 - y * y / Ry**2))
        want = R_rot - math.sqrt((R_rot - z_y) ** 2 - x * x)
        got = sag_np(G.GEOM_TOROIDAL, 1, np.array([x]), np.array([y]),
                     1 / Ry, 0.0, np.array([1 / R_rot]))[0]
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_toroidal_zero_rotation_is_cylinder(self):
        # cv_rot = 0: pure cylinder, no x dependence
        x = np.linspace(-8, 8, 9)
        y = np.full(9, 5.0)
        got = sag_np(G.GEOM_TOROIDAL, 1, x, y, 1 / 40.0, -0.5,
                     np.array([0.0]))
        np.testing.assert_allclose(got, got[0], rtol=1e-13)

    def test_chebyshev_t2_term(self):
        # single T2(x/nx) * T0 term: T2(t) = 2t^2 - 1
        nx, ny = 10.0, 8.0
        rows, cols = 3, 1
        coeffs = np.zeros(2 + rows * cols)
        coeffs[0], coeffs[1] = nx, ny
        coeffs[2 + 2 * cols + 0] = 0.5  # C[2, 0]
        x = np.array([4.0])
        want = 0.5 * (2 * (4.0 / nx) ** 2 - 1)
        got = sag_np(G.GEOM_CHEBYSHEV, len(coeffs), x, np.array([0.0]),
                     0.0, 0.0, coeffs, aux=(rows, cols))[0]
        np.testing.assert_allclose(got, want, rtol=1e-13)

    def test_grid_sag_bilinear_golden(self):
        # 3x3 grid of a bilinear function is reproduced exactly everywhere
        xg = np.array([-1.0, 0.0, 1.0])
        yg = np.array([-1.0, 0.0, 1.0])
        X, Y = np.meshgrid(xg, yg)
        Z = 0.3 + 0.2 * X - 0.1 * Y + 0.05 * X * Y
        coeffs = np.concatenate([xg, yg, Z.ravel()])
        xs = np.array([-0.7, 0.25, 0.9])
        ys = np.array([0.6, -0.45, 0.1])
        want = 0.3 + 0.2 * xs - 0.1 * ys + 0.05 * xs * ys
        got = sag_np(G.GEOM_GRID_SAG, len(coeffs), xs, ys, 0.0, 0.0, coeffs,
                     aux=(3, 3))
        np.testing.assert_allclose(got, want, rtol=1e-13)


# ---------------------------------------------------------------------------
# 2. normal goldens
# ---------------------------------------------------------------------------
class TestNormalGoldens:
    def test_plane_normal_is_minus_z(self):
        nx, ny, nz = normal_np(G.GEOM_PLANE, 0, np.array([2.0]),
                               np.array([-3.0]), 0.0, 0.0, np.zeros(1))
        np.testing.assert_allclose([nx[0], ny[0], nz[0]], [0, 0, -1],
                                   atol=1e-15)

    def test_sphere_normal_points_at_center(self):
        # on a sphere of radius R centered at (0, 0, R), the inward normal
        # at (x, y, z) is (P - C)/R with our nz < 0 orientation
        R = 20.0
        x, y = 4.0, -3.0
        z = R - math.sqrt(R * R - x * x - y * y)
        nx, ny, nz = normal_np(G.GEOM_CONIC, 0, np.array([x]),
                               np.array([y]), 1.0 / R, 0.0, np.zeros(1))
        np.testing.assert_allclose([nx[0], ny[0], nz[0]],
                                   [x / R, y / R, (z - R) / R], rtol=1e-12)

    def test_parabola_normal_analytic(self):
        # z = r^2/(2R): grad = (x/R, y/R, -1), normalized
        R = 30.0
        x, y = 6.0, -2.0
        g = np.array([x / R, y / R, -1.0])
        g /= np.linalg.norm(g)
        nx, ny, nz = normal_np(G.GEOM_CONIC, 0, np.array([x]),
                               np.array([y]), 1.0 / R, -1.0, np.zeros(1))
        np.testing.assert_allclose([nx[0], ny[0], nz[0]], g, rtol=1e-12)

    @pytest.mark.parametrize("code,n_coeffs,coeffs,aux", [
        (G.GEOM_CONIC, 0, np.zeros(1), ()),
        (G.GEOM_EVEN_ASPHERE, 2, np.array([1e-4, -1e-6]), ()),
        (G.GEOM_ODD_ASPHERE, 2, np.array([1e-3, -1e-4]), ()),
        (G.GEOM_BICONIC, 2, np.array([1 / 60.0, 0.1]), ()),
        (G.GEOM_TOROIDAL, 1, np.array([1 / 90.0]), ()),
    ])
    def test_normal_is_unit(self, code, n_coeffs, coeffs, aux):
        rng = np.random.default_rng(0)
        x = rng.uniform(-5, 5, 32)
        y = rng.uniform(-5, 5, 32)
        nx, ny, nz = normal_np(code, n_coeffs, x, y, 1 / 50.0, -0.3, coeffs,
                               aux)
        np.testing.assert_allclose(nx**2 + ny**2 + nz**2, 1.0, rtol=1e-12)
        assert np.all(nz < 0)


# ---------------------------------------------------------------------------
# 3. intersection goldens + self-consistency
# ---------------------------------------------------------------------------
def _intersect_np(code, n_coeffs, rays, cv, k, coeffs, aux=()):
    x, y, z, L, M, N = rays
    t, valid = G.intersect(code, n_coeffs, _j(x), _j(y), _j(z), _j(L),
                           _j(M), _j(N), cv, k, _j(coeffs),
                           newton_iters=32, aux=aux)
    return np.asarray(t), np.asarray(valid)


class TestIntersectionGoldens:
    def test_plane_axial_distance(self):
        rays = (np.array([1.0]), np.array([0.0]), np.array([-7.0]),
                np.array([0.0]), np.array([0.0]), np.array([1.0]))
        t, _ = _intersect_np(G.GEOM_PLANE, 0, rays, 0.0, 0.0, np.zeros(1))
        np.testing.assert_allclose(t, 7.0, rtol=1e-13)

    def test_plane_oblique_distance(self):
        # 45 degrees in the y-z plane from z=-4: t = 4 sqrt(2)
        s = 1 / math.sqrt(2)
        rays = (np.array([0.0]), np.array([0.0]), np.array([-4.0]),
                np.array([0.0]), np.array([s]), np.array([s]))
        t, _ = _intersect_np(G.GEOM_PLANE, 0, rays, 0.0, 0.0, np.zeros(1))
        np.testing.assert_allclose(t, 4 * math.sqrt(2), rtol=1e-13)

    def test_sphere_axial_hit_at_vertex(self):
        rays = (np.array([0.0]), np.array([0.0]), np.array([-10.0]),
                np.array([0.0]), np.array([0.0]), np.array([1.0]))
        t, valid = _intersect_np(G.GEOM_CONIC, 0, rays, 1 / 25.0, 0.0,
                                 np.zeros(1))
        np.testing.assert_allclose(t, 10.0, rtol=1e-13)
        assert valid.all()

    def test_sphere_offset_ray_exact(self):
        # parallel ray at height h hits sphere at z = R - sqrt(R^2 - h^2)
        R, h = 25.0, 5.0
        zhit = R - math.sqrt(R * R - h * h)
        rays = (np.array([0.0]), np.array([h]), np.array([-10.0]),
                np.array([0.0]), np.array([0.0]), np.array([1.0]))
        t, _ = _intersect_np(G.GEOM_CONIC, 0, rays, 1 / R, 0.0, np.zeros(1))
        np.testing.assert_allclose(t, 10.0 + zhit, rtol=1e-13)

    def test_ray_missing_sphere_invalid(self):
        # ray far outside the hemisphere: discriminant < 0
        rays = (np.array([0.0]), np.array([60.0]), np.array([-10.0]),
                np.array([0.0]), np.array([0.0]), np.array([1.0]))
        t, valid = _intersect_np(G.GEOM_CONIC, 0, rays, 1 / 25.0, 0.0,
                                 np.zeros(1))
        assert not valid.any()

    def test_vertex_nearest_root_selected(self):
        # a full sphere has two intersections; the near-vertex one is chosen
        R = 25.0
        rays = (np.array([0.0]), np.array([0.0]), np.array([-10.0]),
                np.array([0.0]), np.array([0.0]), np.array([1.0]))
        t, _ = _intersect_np(G.GEOM_CONIC, 0, rays, 1 / R, 0.0, np.zeros(1))
        assert abs(t[0] - 10.0) < abs(t[0] - (10.0 + 2 * R))

    @pytest.mark.parametrize("code,n_coeffs,coeffs,aux", [
        (G.GEOM_EVEN_ASPHERE, 3, np.array([1e-4, -2e-6, 1e-8]), ()),
        (G.GEOM_ODD_ASPHERE, 2, np.array([1e-3, 1e-4]), ()),
        (G.GEOM_POLYNOMIAL_XY, 9,
         np.array([0, 0.01, 0, -0.02, 5e-3, 0, 1e-3, 0, 0]), ()),
        (G.GEOM_BICONIC, 2, np.array([1 / 70.0, 0.2]), ()),
        (G.GEOM_TOROIDAL, 2, np.array([1 / 120.0, 1e-5]), ()),
    ])
    def test_hit_point_on_surface(self, code, n_coeffs, coeffs, aux):
        rng = np.random.default_rng(7)
        n = 24
        rays = (rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
                np.full(n, -6.0), rng.uniform(-0.1, 0.1, n),
                rng.uniform(-0.1, 0.1, n), np.ones(n))
        rays[5][:] = np.sqrt(1 - rays[3] ** 2 - rays[4] ** 2)
        cv, k = 1 / 45.0, -0.4
        t, valid = _intersect_np(code, n_coeffs, rays, cv, k, coeffs, aux)
        xh = rays[0] + t * rays[3]
        yh = rays[1] + t * rays[4]
        zh = rays[2] + t * rays[5]
        zs = sag_np(code, n_coeffs, xh, yh, cv, k, coeffs, aux)
        np.testing.assert_allclose(zh[valid], zs[valid], rtol=1e-9,
                                   atol=1e-10)


# ---------------------------------------------------------------------------
# 4. parity vs the mounted reference geometry classes
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref_cs(reference):
    from optiland.coordinate_system import CoordinateSystem

    return CoordinateSystem()


def _grid(n=21, lim=4.0):
    x = np.linspace(-lim, lim, n)
    X, Y = np.meshgrid(x, x * 0.8)
    return X.ravel(), Y.ravel()


class TestReferenceParity:
    def test_standard_sag_normal(self, reference, ref_cs):
        from optiland.geometries import StandardGeometry
        from optiland.rays import RealRays

        ref = StandardGeometry(ref_cs, radius=35.0, conic=-0.6)
        x, y = _grid()
        np.testing.assert_allclose(
            sag_np(G.GEOM_CONIC, 0, x, y, 1 / 35.0, -0.6, np.zeros(1)),
            np.asarray(ref.sag(x, y)), rtol=1e-12, atol=1e-14)
        z = sag_np(G.GEOM_CONIC, 0, x, y, 1 / 35.0, -0.6, np.zeros(1))
        rays = RealRays(x.copy(), y.copy(), z.copy(), np.zeros_like(x),
                        np.zeros_like(x), np.ones_like(x),
                        np.ones_like(x), np.full_like(x, 0.55))
        wx, wy, wz = (np.asarray(a) for a in ref.surface_normal(rays))
        nx, ny, nz = normal_np(G.GEOM_CONIC, 0, x, y, 1 / 35.0, -0.6,
                               np.zeros(1))
        np.testing.assert_allclose(np.c_[nx, ny, nz], np.c_[wx, wy, wz],
                                   rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("radius,conic,coeffs", [
        (30.0, 0.0, [1e-4, -1e-6, 1e-8]),
        (-45.0, -0.8, [2e-4, 0.0, -1e-9]),
    ])
    def test_even_asphere_sag(self, reference, ref_cs, radius, conic,
                              coeffs):
        from optiland.geometries import EvenAsphere

        ref = EvenAsphere(ref_cs, radius, conic=conic, coefficients=coeffs)
        x, y = _grid(lim=3.0)
        np.testing.assert_allclose(
            sag_np(G.GEOM_EVEN_ASPHERE, len(coeffs), x, y, 1 / radius,
                   conic, np.asarray(coeffs)),
            np.asarray(ref.sag(x, y)), rtol=1e-12, atol=1e-14)

    def test_odd_asphere_sag(self, reference, ref_cs):
        from optiland.geometries import OddAsphere

        coeffs = [1e-3, -1e-4, 1e-5]
        ref = OddAsphere(ref_cs, 28.0, conic=-0.2, coefficients=coeffs)
        x, y = _grid(lim=3.0)
        np.testing.assert_allclose(
            sag_np(G.GEOM_ODD_ASPHERE, 3, x, y, 1 / 28.0, -0.2,
                   np.asarray(coeffs)),
            np.asarray(ref.sag(x, y)), rtol=1e-12, atol=1e-14)

    def test_polynomial_sag(self, reference, ref_cs):
        from optiland.geometries import PolynomialGeometry

        Cm = np.zeros((3, 3))
        Cm[1, 1] = 1e-3
        Cm[2, 0] = -2e-4
        Cm[0, 2] = 3e-4
        ref = PolynomialGeometry(ref_cs, 55.0, conic=-0.1, coefficients=Cm)
        x, y = _grid(lim=3.0)
        np.testing.assert_allclose(
            sag_np(G.GEOM_POLYNOMIAL_XY, 9, x, y, 1 / 55.0, -0.1,
                   Cm.ravel()),
            np.asarray(ref.sag(x, y)), rtol=1e-12, atol=1e-14)

    def test_forbes_qbfs_sag(self, reference, ref_cs):
        from optiland.geometries.forbes import (ForbesQbfsGeometry,
                                                ForbesSurfaceConfig)

        cfg = ForbesSurfaceConfig(radius=60.0, conic=0.0, norm_radius=10.0,
                                  terms={0: 1e-4, 1: -2e-5, 2: 3e-6})
        ref = ForbesQbfsGeometry(ref_cs, cfg)
        x, y = _grid(lim=6.0)
        coeffs = np.array([10.0, 1e-4, -2e-5, 3e-6])
        np.testing.assert_allclose(
            sag_np(G.GEOM_FORBES_QBFS, 4, x, y, 1 / 60.0, 0.0, coeffs),
            np.asarray(ref.sag(x, y)), rtol=1e-10, atol=1e-12)

    def test_grid_sag_values(self, reference, ref_cs):
        from optiland.geometries import GridSagGeometry

        xg = np.linspace(-5, 5, 11)
        yg = np.linspace(-5, 5, 11)
        X, Y = np.meshgrid(xg, yg)
        Z = 1e-2 * (X**2 - Y**2) + 5e-3 * X * Y
        ref = GridSagGeometry(ref_cs, x_coordinates=xg, y_coordinates=yg,
                              sag_values=Z)
        coeffs = np.concatenate([xg, yg, Z.ravel()])
        rng = np.random.default_rng(1)
        xs = rng.uniform(-4.5, 4.5, 40)
        ys = rng.uniform(-4.5, 4.5, 40)
        np.testing.assert_allclose(
            sag_np(G.GEOM_GRID_SAG, len(coeffs), xs, ys, 0.0, 0.0, coeffs,
                   aux=(11, 11)),
            np.asarray(ref.sag(xs, ys)), rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("geom", ["even", "standard"])
    def test_distance_parity(self, reference, ref_cs, geom):
        from optiland.geometries import EvenAsphere, StandardGeometry
        from optiland.rays import RealRays

        rng = np.random.default_rng(5)
        n = 40
        x = rng.uniform(-3, 3, n)
        y = rng.uniform(-3, 3, n)
        z = np.full(n, -8.0)
        L = rng.uniform(-0.12, 0.12, n)
        M = rng.uniform(-0.12, 0.12, n)
        N = np.sqrt(1 - L**2 - M**2)
        rays = RealRays(x.copy(), y.copy(), z.copy(), L.copy(), M.copy(),
                        N.copy(), np.ones(n), np.full(n, 0.55))
        if geom == "even":
            coeffs = [1e-4, -1e-6]
            ref = EvenAsphere(ref_cs, 32.0, conic=-0.3, coefficients=coeffs)
            t, _ = _intersect_np(G.GEOM_EVEN_ASPHERE, 2,
                                 (x, y, z, L, M, N), 1 / 32.0, -0.3,
                                 np.asarray(coeffs))
        else:
            ref = StandardGeometry(ref_cs, 32.0, conic=-0.3)
            t, _ = _intersect_np(G.GEOM_CONIC, 0, (x, y, z, L, M, N),
                                 1 / 32.0, -0.3, np.zeros(1))
        np.testing.assert_allclose(t, np.asarray(ref.distance(rays)),
                                   rtol=1e-9, atol=1e-10)
