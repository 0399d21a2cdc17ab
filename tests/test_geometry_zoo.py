"""Freeform geometry parity vs the reference: sag, normal, and ray
intersection for biconic / toroidal / chebyshev / zernike surfaces."""

import numpy as np
import pytest

import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.geometry import surfaces as G


@pytest.fixture(scope="module")
def ref_cs(reference):
    from optiland.coordinate_system import CoordinateSystem

    return CoordinateSystem()


def _rand_xy(n=64, scale=4.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-scale, scale, n), rng.uniform(-scale, scale, n))


def _rand_rays(n=32, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3, 3, n)
    y = rng.uniform(-3, 3, n)
    z = np.full(n, -5.0)
    L = rng.uniform(-0.15, 0.15, n)
    M = rng.uniform(-0.15, 0.15, n)
    N = np.sqrt(1 - L**2 - M**2)
    return x, y, z, L, M, N


def _check_intersect(reference, ref_geom, code, n_coeffs, cv, k, coeffs, aux):
    from optiland.rays import RealRays

    x, y, z, L, M, N = _rand_rays()
    rays = RealRays(x.copy(), y.copy(), z.copy(), L.copy(), M.copy(),
                    N.copy(), np.ones_like(x), np.full_like(x, 0.55))
    t_ref = np.asarray(ref_geom.distance(rays))
    t_got, _ = G.intersect(code, n_coeffs, jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(z), jnp.asarray(L), jnp.asarray(M),
                           jnp.asarray(N), cv, k, jnp.asarray(coeffs),
                           newton_iters=32, aux=aux)
    np.testing.assert_allclose(np.asarray(t_got), t_ref, rtol=1e-8, atol=1e-9)


def test_biconic_parity(reference, ref_cs):
    from optiland.geometries import BiconicGeometry

    ref = BiconicGeometry(ref_cs, radius_x=80.0, radius_y=-120.0,
                          conic_x=-0.5, conic_y=0.8)
    x, y = _rand_xy()
    ref_sag = np.asarray(ref.sag(x, y))
    coeffs = jnp.asarray([1.0 / -120.0, 0.8])
    got_sag = np.asarray(G.sag(G.GEOM_BICONIC, 2, jnp.asarray(x),
                               jnp.asarray(y), 1.0 / 80.0, -0.5, coeffs))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-10, atol=1e-12)
    _check_intersect(reference, ref, G.GEOM_BICONIC, 2, 1.0 / 80.0, -0.5,
                     coeffs, ())


def test_toroidal_parity(reference, ref_cs):
    from optiland.geometries import ToroidalGeometry

    ref = ToroidalGeometry(ref_cs, radius_x=100.0, radius_y=50.0, conic=-0.3,
                           coeffs_poly_y=[1e-5, -2e-8])
    x, y = _rand_xy(scale=3.0)
    ref_sag = np.asarray(ref.sag(x, y))
    coeffs = jnp.asarray([1.0 / 100.0, 1e-5, -2e-8])
    got_sag = np.asarray(G.sag(G.GEOM_TOROIDAL, 3, jnp.asarray(x),
                               jnp.asarray(y), 1.0 / 50.0, -0.3, coeffs))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-10, atol=1e-12)
    _check_intersect(reference, ref, G.GEOM_TOROIDAL, 3, 1.0 / 50.0, -0.3,
                     coeffs, ())


def test_chebyshev_parity(reference, ref_cs):
    from optiland.geometries import ChebyshevPolynomialGeometry

    C = np.array([[0.0, 1e-4, -2e-5], [3e-5, -1e-5, 5e-6]])
    ref = ChebyshevPolynomialGeometry(ref_cs, radius=60.0, conic=-0.2,
                                      coefficients=C, norm_x=5.0, norm_y=5.0)
    x, y = _rand_xy(scale=4.0)
    ref_sag = np.asarray(ref.sag(x, y))
    coeffs = jnp.asarray([5.0, 5.0] + list(C.ravel()))
    got_sag = np.asarray(G.sag(G.GEOM_CHEBYSHEV, coeffs.shape[0],
                               jnp.asarray(x), jnp.asarray(y), 1.0 / 60.0,
                               -0.2, coeffs, aux=(2, 3)))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-10, atol=1e-12)
    _check_intersect(reference, ref, G.GEOM_CHEBYSHEV, coeffs.shape[0],
                     1.0 / 60.0, -0.2, coeffs, (2, 3))


@pytest.mark.parametrize("ztype", ["fringe", "noll", "standard"])
def test_zernike_geometry_parity(ztype, reference, ref_cs):
    from optiland.geometries import ZernikePolynomialGeometry

    zc = np.array([0.0, 1e-4, -2e-4, 5e-5, 3e-5, -1e-5])
    ref = ZernikePolynomialGeometry(ref_cs, radius=70.0, conic=-0.1,
                                    coefficients=zc, norm_radius=6.0,
                                    zernike_type=ztype)
    x, y = _rand_xy(scale=4.0)
    ref_sag = np.asarray(ref.sag(x, y))
    coeffs = jnp.asarray([6.0] + list(zc))
    aux = (G.ZERNIKE_TYPE_CODES[ztype],)
    got_sag = np.asarray(G.sag(G.GEOM_ZERNIKE, coeffs.shape[0],
                               jnp.asarray(x), jnp.asarray(y), 1.0 / 70.0,
                               -0.1, coeffs, aux=aux))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-9, atol=1e-12)
    _check_intersect(reference, ref, G.GEOM_ZERNIKE, coeffs.shape[0],
                     1.0 / 70.0, -0.1, coeffs, aux)


def test_freeform_surface_normals_match_reference(reference, ref_cs):
    from optiland.geometries import BiconicGeometry
    from optiland.rays import RealRays

    ref = BiconicGeometry(ref_cs, radius_x=80.0, radius_y=-120.0,
                          conic_x=-0.5, conic_y=0.8)
    x, y = _rand_xy(n=16, scale=3.0)
    z = np.asarray(ref.sag(x, y))
    rays = RealRays(x, y, z, np.zeros_like(x), np.zeros_like(x),
                    np.ones_like(x), np.ones_like(x), np.full_like(x, 0.55))
    nx_r, ny_r, nz_r = (np.asarray(v) for v in ref.surface_normal(rays))
    coeffs = jnp.asarray([1.0 / -120.0, 0.8])
    nx, ny, nz = G.surface_normal(G.GEOM_BICONIC, 2, jnp.asarray(x),
                                  jnp.asarray(y), 1.0 / 80.0, -0.5, coeffs)
    np.testing.assert_allclose(np.asarray(nx), nx_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ny), ny_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(nz), nz_r, rtol=1e-8, atol=1e-10)


def test_full_trace_with_freeform_surface():
    """End-to-end: a lens with a chebyshev freeform surface traces and is
    differentiable."""
    import math

    import jax

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.52,
                     is_stop=True, surface_type="chebyshev",
                     coefficients=[[0.0, 1e-5], [2e-5, 0.0]],
                     norm_x=10.0, norm_y=10.0)
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)

    hist = lens.trace(Hx=0.0, Hy=0.0, num_rays=4)
    assert np.all(np.isfinite(np.asarray(hist.y[-1])))

    static, params = lens.build()
    from optiland_tpu.trace.tracer import trace_system

    def merit(p):
        h = trace_system(static, p, jnp.zeros(8), jnp.zeros(8),
                         jnp.linspace(-1, 1, 8), jnp.zeros(8), 0.55)
        return jnp.mean(h.y[-1] ** 2 + h.x[-1] ** 2)

    g = jax.grad(merit)(params)
    assert np.isfinite(float(jnp.sum(g.coeffs)))
    assert float(jnp.abs(g.coeffs[1]).sum()) > 0  # freeform coeffs get grads
