"""Golden-value tests for the geometry kernels (sag/normal/intersection),
mirroring the reference's `tests/test_geometries.py` strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optiland_tpu  # noqa: F401  (enables x64)
from optiland_tpu.geometry import (
    GEOM_CONIC,
    GEOM_EVEN_ASPHERE,
    GEOM_PLANE,
    intersect,
    sag,
    sag_and_grad,
    surface_normal,
)


def test_conic_sag_sphere():
    # sphere R=10: sag at r=1 is R - sqrt(R^2 - r^2)
    got = sag(GEOM_CONIC, 0, 1.0, 0.0, 0.1, 0.0, jnp.zeros(4))
    want = 10 - np.sqrt(100 - 1)
    assert abs(float(got) - want) < 1e-12


def test_plane_sag_zero():
    assert float(sag(GEOM_PLANE, 0, 3.0, -2.0, 0.0, 0.0, jnp.zeros(1))) == 0.0


def test_conic_grad_matches_autodiff():
    cv, k = 1 / 25.0, -0.5
    coeffs = jnp.zeros(4)

    def f(x, y):
        return sag(GEOM_CONIC, 0, x, y, cv, k, coeffs)

    x, y = 2.0, -1.5
    gx_ad = jax.grad(f, argnums=0)(x, y)
    gy_ad = jax.grad(f, argnums=1)(x, y)
    _, gx, gy = sag_and_grad(GEOM_CONIC, 0, x, y, cv, k, coeffs)
    np.testing.assert_allclose(gx, gx_ad, rtol=1e-12)
    np.testing.assert_allclose(gy, gy_ad, rtol=1e-12)


def test_even_asphere_grad_matches_autodiff():
    cv, k = 1 / 30.0, 0.2
    coeffs = jnp.array([1e-4, -2e-6, 3e-8, 0.0])

    def f(x, y):
        return sag(GEOM_EVEN_ASPHERE, 3, x, y, cv, k, coeffs)

    x, y = 1.2, 2.1
    gx_ad = jax.grad(f, argnums=0)(x, y)
    gy_ad = jax.grad(f, argnums=1)(x, y)
    _, gx, gy = sag_and_grad(GEOM_EVEN_ASPHERE, 3, x, y, cv, k, coeffs)
    np.testing.assert_allclose(gx, gx_ad, rtol=1e-12)
    np.testing.assert_allclose(gy, gy_ad, rtol=1e-12)


def test_plane_intersection():
    # ray from z=-5 along +z hits plane z=0 at t=5
    t, valid = intersect(GEOM_PLANE, 0, 0.0, 0.0, -5.0, 0.0, 0.0, 1.0,
                         0.0, 0.0, jnp.zeros(1))
    assert bool(valid)
    np.testing.assert_allclose(t, 5.0, rtol=1e-14)


def test_sphere_intersection_on_axis():
    # sphere R=10, vertex at 0; axial ray from z=-5 hits at z=0 => t=5
    t, valid = intersect(GEOM_CONIC, 0, 0.0, 0.0, -5.0, 0.0, 0.0, 1.0,
                         0.1, 0.0, jnp.zeros(1))
    assert bool(valid)
    np.testing.assert_allclose(t, 5.0, rtol=1e-12)


def test_sphere_intersection_off_axis_exact():
    # marginal ray parallel to axis at height y: hits sphere where
    # z = R - sqrt(R^2 - y^2)
    R, y0 = 20.0, 4.0
    t, valid = intersect(GEOM_CONIC, 0, 0.0, y0, -10.0, 0.0, 0.0, 1.0,
                         1.0 / R, 0.0, jnp.zeros(1))
    z_hit = -10.0 + float(t)
    np.testing.assert_allclose(z_hit, R - np.sqrt(R**2 - y0**2), rtol=1e-12)


def test_asphere_newton_converges():
    cv, k = 1 / 15.0, -1.2
    coeffs = jnp.array([2e-4, -1e-6])
    y0 = 3.0
    t, valid = intersect(GEOM_EVEN_ASPHERE, 2, 0.0, y0, -8.0, 0.0, 0.0, 1.0,
                         cv, k, coeffs)
    z_hit = -8.0 + float(t)
    want = float(sag(GEOM_EVEN_ASPHERE, 2, 0.0, y0, cv, k, coeffs))
    np.testing.assert_allclose(z_hit, want, atol=1e-12)


def test_normal_is_unit_and_matches_grad():
    cv, k = 1 / 12.0, 0.0
    nx, ny, nz = surface_normal(GEOM_CONIC, 0, 1.0, 2.0, cv, k, jnp.zeros(1))
    np.testing.assert_allclose(nx**2 + ny**2 + nz**2, 1.0, rtol=1e-12)
    assert float(nz) < 0


@pytest.mark.parametrize("cv", [0.0, 0.05, -0.08])
def test_intersect_consistent_with_sag(cv):
    # oblique rays: the hit point must lie on the surface
    k = -0.7
    t, valid = intersect(GEOM_CONIC, 0, 0.3, -0.2, -6.0, 0.05, -0.03,
                         float(np.sqrt(1 - 0.05**2 - 0.03**2)), cv, k,
                         jnp.zeros(1))
    x = 0.3 + float(t) * 0.05
    y = -0.2 + float(t) * -0.03
    z = -6.0 + float(t) * float(np.sqrt(1 - 0.05**2 - 0.03**2))
    want = float(sag(GEOM_CONIC, 0, x, y, cv, k, jnp.zeros(1)))
    np.testing.assert_allclose(z, want, atol=1e-11)
