"""Grating diffraction parity vs the reference's closed-form
`RealRays.gratingdiffract` (`rays/real_rays.py:207-522`)."""

import numpy as np
import pytest

import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.core import rays as R
from optiland_tpu.core.rays import make_rays


def _rand_rays_np(n=64, seed=3):
    rng = np.random.default_rng(seed)
    L = rng.uniform(-0.2, 0.2, n)
    M = rng.uniform(-0.2, 0.2, n)
    N = np.sqrt(1 - L**2 - M**2)
    x = rng.uniform(-2, 2, n)
    y = rng.uniform(-2, 2, n)
    z = np.zeros(n)
    w = np.full(n, 0.55)
    return x, y, z, L, M, N, w


@pytest.mark.parametrize("is_reflective", [False, True])
@pytest.mark.parametrize("m", [-1, 1, 2])
def test_grating_diffract_parity(reference, is_reflective, m):
    from optiland.rays import RealRays

    x, y, z, L, M, N, w = _rand_rays_np()
    angle = 0.3
    fx = -np.sin(angle) * np.ones_like(x)
    fy = np.cos(angle) * np.ones_like(x)
    fz = np.zeros_like(x)
    d = 10.0  # um
    n1, n2 = 1.0, 1.55

    ref = RealRays(x.copy(), y.copy(), z.copy(), L.copy(), M.copy(), N.copy(),
                   np.ones_like(x), w.copy())
    ref.gratingdiffract(np.zeros_like(x), np.zeros_like(x), np.ones_like(x),
                        fx, fy, fz, m, d, n1, n2, is_reflective)

    rays = make_rays(x, y, z, L, M, N, wavelength=w)
    out = R.grating_diffract(rays, jnp.zeros_like(rays.x),
                             jnp.zeros_like(rays.x), jnp.ones_like(rays.x),
                             jnp.asarray(fx), jnp.asarray(fy),
                             jnp.asarray(fz), float(m), d, n1, n2,
                             is_reflective)

    ref_L = np.asarray(ref.L)
    ok = np.isfinite(ref_L)  # reference lets evanescent orders go NaN
    assert ok.sum() > 10
    np.testing.assert_allclose(np.asarray(out.L)[ok], ref_L[ok],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.M)[ok], np.asarray(ref.M)[ok],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.N)[ok], np.asarray(ref.N)[ok],
                               rtol=1e-9, atol=1e-12)
    # evanescent rays are masked in ours, NaN in theirs
    assert np.all(np.asarray(out.i)[~ok] == 0)


def test_grating_surface_end_to_end():
    """A transmission grating surface bends the primary order as m*lambda/d."""
    import math

    from optiland_tpu.system.optic import Optic

    d_um = 2.0
    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=math.inf, thickness=10.0,
                     surface_type="grating", is_stop=True,
                     grating_order=1, grating_period=d_um,
                     groove_orientation_angle=0.0)
    lens.add_surface(index=2)
    lens.set_aperture("EPD", 4.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)

    hist = lens.trace(Hx=0.0, Hy=0.0, num_rays=2)
    M = np.asarray(hist.M[-2])
    # first-order deflection: sin(theta) = m * lambda / d along the grating
    # vector (y for angle 0)
    expected = 0.55 / d_um
    np.testing.assert_allclose(M[np.asarray(hist.intensity[-2]) > 0],
                               expected, rtol=1e-9)
