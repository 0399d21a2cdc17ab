"""Fused Pallas trace kernel: parity with the XLA tracer (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.trace.fused import supports_fused, trace_final
from optiland_tpu.trace.raygen import generate_rays
from optiland_tpu.trace.tracer import trace_rays


def _singlet(newton_iters=4, asphere=False):
    import math

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    kw = {}
    if asphere:
        kw = dict(surface_type="even_asphere", coefficients=(1e-6, -1e-9))
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.52,
                     is_stop=True, **kw)
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.add_wavelength(0.55, is_primary=True)
    lens.build()
    static, params = lens._built
    from dataclasses import replace

    lens._built = (replace(static, newton_iters=newton_iters), params)
    return lens


def _rays(static, params, n=256):
    rng = np.random.default_rng(0)
    Px = jnp.asarray(rng.uniform(-1, 1, n))
    Py = jnp.asarray(rng.uniform(-1, 1, n))
    H0 = jnp.zeros(n)
    w = jnp.full((n,), 0.55)
    return generate_rays(static, params, H0, H0, Px, Py, w)


@pytest.mark.parametrize("asphere", [False, True])
def test_fused_forward_parity(asphere):
    lens = _singlet(asphere=asphere)
    static, params = lens.build()
    assert supports_fused(static)
    rays0 = _rays(static, params)
    ref = trace_rays(static, params, rays0)
    got = trace_final(static, params, rays0, interpret=True)
    np.testing.assert_allclose(np.asarray(got["x"]), np.asarray(ref.x[-1]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["y"]), np.asarray(ref.y[-1]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["opd"]),
                               np.asarray(ref.opd[-1]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got["intensity"]),
                               np.asarray(ref.intensity[-1]), atol=1e-12)


def test_fused_backward_parity():
    lens = _singlet(newton_iters=2)  # conic-only: Newton not used
    static, params = lens.build()
    rays0 = jax.lax.stop_gradient(_rays(static, params, n=128))

    def m_fused(p):
        out = trace_final(static, p, rays0, interpret=True)
        return jnp.sum(out["x"] ** 2 + out["y"] ** 2)

    def m_xla(p):
        h = trace_rays(static, p, rays0)
        return jnp.sum(h.x[-1] ** 2 + h.y[-1] ** 2)

    gf = jax.grad(m_fused)(params)
    gx = jax.grad(m_xla)(params)
    for name in ("cv", "conic", "thickness"):
        a = np.asarray(getattr(gf, name))
        b = np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-9)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-6,
                                   err_msg=name)


def test_fused_fallback_for_unsupported():
    """Tilted systems fall back to the XLA path transparently."""
    import math

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     is_stop=True, rx=0.01)
    lens.add_surface(index=2)
    lens.set_aperture("EPD", 5.0)
    lens.add_wavelength(0.55)
    static, params = lens.build()
    assert not supports_fused(static)
    rays0 = _rays(static, params, n=64)
    out = trace_final(static, params, rays0)
    ref = trace_rays(static, params, rays0)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(ref.y[-1]))
