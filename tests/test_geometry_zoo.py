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


def test_forbes_qbfs_parity(reference, ref_cs):
    from optiland.geometries.forbes import (
        ForbesQbfsGeometry,
        ForbesSurfaceConfig,
    )

    terms = {0: 1e-4, 1: -2e-5, 2: 3e-6, 4: -5e-8}
    cfg = ForbesSurfaceConfig(radius=100.0, conic=-0.5, norm_radius=8.0,
                              terms=terms)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = ForbesQbfsGeometry(ref_cs, cfg)
    x, y = _rand_xy(scale=4.0)
    ref_sag = np.asarray(ref.sag(x, y))
    coeffs = jnp.asarray([8.0, 1e-4, -2e-5, 3e-6, 0.0, -5e-8])
    got_sag = np.asarray(G.sag(G.GEOM_FORBES_QBFS, 6, jnp.asarray(x),
                               jnp.asarray(y), 0.01, -0.5, coeffs))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-10, atol=1e-12)
    _check_intersect(reference, ref, G.GEOM_FORBES_QBFS, 6, 0.01, -0.5,
                     coeffs, ())


def test_forbes_q2d_parity(reference, ref_cs):
    from optiland.geometries.forbes import (
        ForbesQ2dGeometry,
        ForbesSurfaceConfig,
    )

    terms = {
        ("a", 0, 1): 2e-4,
        ("a", 0, 2): -1e-5,
        ("a", 2, 0): 5e-5,
        ("b", 2, 1): -3e-5,
        ("a", 3, 1): 1e-5,
        ("b", 1, 2): 2e-6,
    }
    cfg = ForbesSurfaceConfig(radius=150.0, conic=0.2, norm_radius=9.0,
                              terms=terms)
    ref = ForbesQ2dGeometry(ref_cs, cfg)
    x, y = _rand_xy(scale=4.0, seed=3)
    ref_sag = np.asarray(ref.sag(x, y))

    # pack via the spec helper so key sorting matches
    from optiland_tpu.system.spec import SurfaceSpec, _pack_geometry

    spec = SurfaceSpec(radius=150.0, conic=0.2, geometry="forbes_q2d",
                       geom_params={"freeform_coeffs": terms,
                                    "norm_radius": 9.0})
    code, cv, k, coeffs, aux = _pack_geometry(spec)
    got_sag = np.asarray(G.sag(code, len(coeffs), jnp.asarray(x),
                               jnp.asarray(y), cv, k, jnp.asarray(coeffs),
                               aux=aux))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-9, atol=1e-12)
    _check_intersect(reference, ref, code, len(coeffs), cv, k,
                     jnp.asarray(coeffs), aux)


def test_grid_sag_parity(reference, ref_cs):
    from optiland.geometries import GridSagGeometry

    rng = np.random.default_rng(7)
    xg = np.linspace(-6.0, 6.0, 25)
    yg = np.linspace(-6.0, 6.0, 31)
    zg = 1e-3 * rng.standard_normal((31, 25)).cumsum(axis=0).cumsum(axis=1)
    ref = GridSagGeometry(ref_cs, list(xg), list(yg), zg)
    x, y = _rand_xy(scale=5.0, seed=5)
    ref_sag = np.asarray(ref.sag(x, y))

    from optiland_tpu.system.spec import SurfaceSpec, _pack_geometry

    spec = SurfaceSpec(geometry="grid_sag",
                       geom_params={"x_coordinates": xg, "y_coordinates": yg,
                                    "sag_values": zg})
    code, cv, k, coeffs, aux = _pack_geometry(spec)
    got_sag = np.asarray(G.sag(code, len(coeffs), jnp.asarray(x),
                               jnp.asarray(y), cv, k, jnp.asarray(coeffs),
                               aux=aux))
    np.testing.assert_allclose(got_sag, ref_sag, rtol=1e-10, atol=1e-12)
    _check_intersect(reference, ref, code, len(coeffs), cv, k,
                     jnp.asarray(coeffs), aux)


def test_nurbs_fitted_conic():
    """A NURBS patch LSQ-fitted to a conic must reproduce its sag, gradient,
    and ray intersection inside the patch (reference fit_surface analogue)."""
    from optiland_tpu.system.spec import SurfaceSpec, _pack_geometry

    spec = SurfaceSpec(radius=60.0, conic=-0.8, geometry="nurbs",
                       geom_params={"n_points_u": 10, "n_points_v": 10,
                                    "nurbs_norm_x": 8.0, "nurbs_norm_y": 8.0})
    code, cv, k, coeffs, aux = _pack_geometry(spec)
    x, y = _rand_xy(n=64, scale=5.0, seed=11)
    want = np.asarray(G.sag(G.GEOM_CONIC, 0, jnp.asarray(x), jnp.asarray(y),
                            1.0 / 60.0, -0.8, jnp.zeros(1)))
    got = np.asarray(G.sag(code, len(coeffs), jnp.asarray(x), jnp.asarray(y),
                           cv, k, jnp.asarray(coeffs), aux=aux))
    np.testing.assert_allclose(got, want, atol=5e-7)

    # gradients of the graph
    _, gx, gy = G.sag_and_grad(code, len(coeffs), jnp.asarray(x),
                               jnp.asarray(y), cv, k, jnp.asarray(coeffs),
                               aux=aux)
    _, gx_w, gy_w = G.sag_and_grad(G.GEOM_CONIC, 0, jnp.asarray(x),
                                   jnp.asarray(y), 1.0 / 60.0, -0.8,
                                   jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_w), atol=5e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_w), atol=5e-6)

    # intersection
    xr, yr, zr, L, M, N = _rand_rays(n=24, seed=13)
    t_want, _ = G.intersect(G.GEOM_CONIC, 0, jnp.asarray(xr), jnp.asarray(yr),
                            jnp.asarray(zr), jnp.asarray(L), jnp.asarray(M),
                            jnp.asarray(N), 1.0 / 60.0, -0.8, jnp.zeros(1))
    t_got, valid = G.intersect(code, len(coeffs), jnp.asarray(xr),
                               jnp.asarray(yr), jnp.asarray(zr),
                               jnp.asarray(L), jnp.asarray(M),
                               jnp.asarray(N), cv, k, jnp.asarray(coeffs),
                               newton_iters=16, aux=aux)
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want),
                               atol=2e-6)


def test_nurbs_eval_matches_reference_bspline(reference, ref_cs):
    """surface_eval against the reference's B-spline evaluator on a shared
    random control net."""
    from optiland.geometries import NurbsGeometry

    rng = np.random.default_rng(21)
    nu = nv = 6
    p = q = 3
    from optiland_tpu.geometry import nurbs as NB

    U = NB.clamped_uniform_knots(nu, p)
    V = NB.clamped_uniform_knots(nv, q)
    gu = NB.greville(U, p, nu)
    gv = NB.greville(V, q, nv)
    Px = np.tile(gu[:, None] * 10 - 5, (1, nv))
    Py = np.tile(gv[None, :] * 10 - 5, (nu, 1))
    Pz = 0.1 * rng.standard_normal((nu, nv))
    P = np.stack([Px, Py, Pz])
    W = np.ones((nu, nv)) + 0.2 * rng.uniform(size=(nu, nv))

    ref = NurbsGeometry(ref_cs, control_points=P, weights=W, u_degree=p,
                        v_degree=q, u_knots=U, v_knots=V)
    u = rng.uniform(0.02, 0.98, 40)
    v = rng.uniform(0.02, 0.98, 40)
    want = np.asarray(ref.get_value(u, v))  # (3, n)
    S, _, _ = NB.surface_eval(jnp.asarray(U), jnp.asarray(V),
                              jnp.asarray(W.ravel()),
                              jnp.asarray(Px.ravel()), jnp.asarray(Py.ravel()),
                              jnp.asarray(Pz.ravel()), p, q, nu, nv,
                              jnp.asarray(u), jnp.asarray(v))
    for c in range(3):
        np.testing.assert_allclose(np.asarray(S[c]), want[c], rtol=1e-9,
                                   atol=1e-10)


def test_full_trace_with_forbes_and_grid_surfaces():
    """End-to-end: an Optic holding forbes_qbfs and grid_sag surfaces builds
    and traces with finite spots."""
    from optiland_tpu.system.optic import Optic
    from optiland_tpu.trace.tracer import trace_system

    xg = np.linspace(-15.0, 15.0, 21)
    yg = np.linspace(-15.0, 15.0, 21)
    zg = np.zeros((21, 21))

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=6.0, material=1.6,
                     is_stop=True, surface_type="forbes_qbfs",
                     radial_terms={0: 1e-4, 1: -1e-5}, norm_radius=12.0)
    lens.add_surface(index=2, radius=-80.0, thickness=4.0)
    lens.add_surface(index=3, surface_type="grid_sag", thickness=70.0,
                     x_coordinates=xg, y_coordinates=yg, sag_values=zg)
    lens.add_surface(index=4)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(0.0, 0.0)
    lens.add_wavelength(0.55, is_primary=True)
    static, params = lens.build()
    n = 32
    hist = trace_system(static, params,
                        jnp.zeros(n), jnp.zeros(n),
                        jnp.linspace(-0.9, 0.9, n), jnp.zeros(n),
                        jnp.full(n, 0.55))
    assert np.isfinite(np.asarray(hist.x[-1])).all()
    assert float(np.asarray(hist.intensity[-1]).sum()) > 0
