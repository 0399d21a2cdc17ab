"""Iterative/robust ray aiming and GlassExpert."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


def test_iterative_aiming_hits_stop_targets():
    import jax.numpy as jnp

    from optiland_tpu.trace.aiming import aim_rays_iterative, stop_radius
    from optiland_tpu.trace.raygen import generate_rays
    from optiland_tpu.trace.tracer import trace_rays

    lens = CookeTriplet()
    static, params = lens.build()
    stop = static.stop_index
    # the aim target is the REAL marginal-ray stop radius (reference
    # `ray_aiming/initialization.py:72-135` RealReferenceStrategy)
    r_stop = float(np.asarray(stop_radius(static, params, 0.55)))

    Py = jnp.asarray(np.linspace(-0.9, 0.9, 7))
    Px = jnp.zeros_like(Py)
    Hy = jnp.ones_like(Py)
    Hx = jnp.zeros_like(Py)
    w = jnp.asarray(0.55)

    PxA, PyA = aim_rays_iterative(static, params, Hx, Hy, Px, Py, w, iters=5)
    rays0 = generate_rays(static, params, Hx, Hy, PxA, PyA, w,
                          apply_vignetting=False)
    hist = trace_rays(static, params, rays0)
    got = np.asarray(hist.y[stop]) / r_stop
    np.testing.assert_allclose(got, np.asarray(Py), atol=1e-6)


def test_optic_ray_aiming_mode_validation():
    lens = CookeTriplet()
    with pytest.raises(ValueError):
        lens.set_ray_aiming("bogus")
    lens.set_ray_aiming("iterative")
    h = lens.trace(Hx=0, Hy=1.0, num_rays=3)
    assert np.all(np.isfinite(np.asarray(h.y[-1])))


def test_glass_expert_improves_or_keeps():
    from optiland_tpu.optimization import GlassExpert, OptimizationProblem

    lens = CookeTriplet()
    p = OptimizationProblem(lens)
    p.add_operand(operand_type="f2", target=50.1, weight=1)
    p.add_operand(operand_type="LchC_sum", target=0, weight=10)
    p.add_variable(lens, "radius", surface_number=1)
    p.add_variable(lens, "radius", surface_number=6)

    before = float(np.asarray(p.sum_squared()))
    ge = GlassExpert(p, glass_surfaces=[3],
                     glass_selection=["F2", "N-SF5", "SF11", "N-BK7", "LAK9"],
                     pool_size=4, verbose=False)
    ge.optimize(maxiter=20, disp=False)
    after = float(np.asarray(p.sum_squared()))
    assert np.isfinite(after)
    assert after <= before * 1.001  # never worse (rolls back on failure)
