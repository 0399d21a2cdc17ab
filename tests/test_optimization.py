"""Optimization-layer tests (BASELINE config 4): Seidel parity, operand
parity, gradient parity vs the reference (finite differences and torch
autograd where available), and end-to-end optimizer runs."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet
from optiland_tpu.optimization import (
    AdamOptimizer,
    LeastSquares,
    OptimizationProblem,
    OptimizerGeneric,
)


@pytest.fixture(scope="module")
def ref_cooke(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    return RefCooke()


@pytest.fixture()
def tpu_cooke():
    return CookeTriplet()


ABERRATION_TERMS = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
                    "TAchC", "LchC", "TchC"]


@pytest.mark.parametrize("term", ABERRATION_TERMS)
def test_aberration_parity(term, ref_cooke, tpu_cooke):
    from optiland_tpu.system import aberrations as ab

    ref_vals = np.asarray(getattr(ref_cooke.aberrations, term)())
    static, params = tpu_cooke.build()
    got_vals = np.asarray(getattr(ab, term)(static, params))
    np.testing.assert_allclose(got_vals, ref_vals.ravel(), rtol=1e-8,
                               atol=1e-12)


def test_seidel_parity(ref_cooke, tpu_cooke):
    from optiland_tpu.system import aberrations as ab

    ref_S = np.asarray(ref_cooke.aberrations.seidels())
    static, params = tpu_cooke.build()
    got_S = np.asarray(ab.seidels(static, params))
    np.testing.assert_allclose(got_S, ref_S, rtol=1e-8, atol=1e-12)


def test_operand_values_match_reference(ref_cooke, tpu_cooke):
    from optiland.optimization import OptimizationProblem as RefProblem

    ref_p = RefProblem()
    ref_p.add_operand(operand_type="f2", target=50, weight=1,
                      input_data={"optic": ref_cooke})
    ref_p.add_operand(
        operand_type="rms_spot_size", target=0, weight=1,
        input_data={"optic": ref_cooke, "surface_number": -1, "Hx": 0,
                    "Hy": 0.7, "num_rays": 5, "wavelength": 0.55},
    )
    ref_vals = np.asarray([float(v) for v in ref_p.fun_array()])

    p = OptimizationProblem(tpu_cooke)
    p.add_operand(operand_type="f2", target=50, weight=1)
    p.add_operand(operand_type="rms_spot_size", target=0, weight=1,
                  input_data={"surface_number": -1, "Hx": 0, "Hy": 0.7,
                              "num_rays": 5, "wavelength": 0.55})
    got_vals = np.asarray(p.fun_array())
    np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-8, atol=1e-10)


def test_gradient_matches_reference_finite_difference(ref_cooke, tpu_cooke):
    """Analytic JAX gradient of the merit vs central finite differences of
    the REFERENCE's merit over the same variables (grad parity <= 1e-6)."""
    import jax.numpy as jnp

    p = OptimizationProblem(tpu_cooke)
    p.add_operand(operand_type="f2", target=50, weight=1)
    p.add_operand(operand_type="rms_spot_size", target=0, weight=1,
                  input_data={"surface_number": -1, "Hx": 0, "Hy": 0.7,
                              "num_rays": 5, "wavelength": 0.55})
    for s in (1, 2, 3):
        p.add_variable(tpu_cooke, "radius", surface_number=s)
    p.add_variable(tpu_cooke, "thickness", surface_number=4)

    c = p._compile()
    x0 = p.x0()
    _, g = c["value_and_grad"](x0, tpu_cooke.params)
    g = np.asarray(g, float)

    # reference merit as a function of the same scaled variables
    from optiland.optimization import OptimizationProblem as RefProblem

    ref_p = RefProblem()
    ref_p.add_operand(operand_type="f2", target=50, weight=1,
                      input_data={"optic": ref_cooke})
    ref_p.add_operand(
        operand_type="rms_spot_size", target=0, weight=1,
        input_data={"optic": ref_cooke, "surface_number": -1, "Hx": 0,
                    "Hy": 0.7, "num_rays": 5, "wavelength": 0.55},
    )
    for s in (1, 2, 3):
        ref_p.add_variable(ref_cooke, "radius", surface_number=s)
    ref_p.add_variable(ref_cooke, "thickness", surface_number=4)

    def ref_merit(x):
        for var, xi in zip(ref_p.variables.variables, x):
            var.update(float(xi))
        ref_p.update_optics()
        return float(ref_p.sum_squared())

    # scalers match the reference defaults, so the scaled x0 must agree
    ref_x0 = np.asarray([float(v.value) for v in ref_p.variables.variables])
    x0_np = np.asarray(x0, float)
    np.testing.assert_allclose(x0_np, ref_x0, rtol=1e-12)
    eps = 1e-6
    fd = np.zeros_like(x0_np)
    for i in range(len(x0_np)):
        xp = x0_np.copy(); xp[i] += eps
        xm = x0_np.copy(); xm[i] -= eps
        fd[i] = (ref_merit(xp) - ref_merit(xm)) / (2 * eps)
    # restore reference lens
    for var, xi in zip(ref_p.variables.variables, x0_np):
        var.update(float(xi))

    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-6)
    del jnp


def test_adam_reduces_merit(tpu_cooke):
    # detune the (near-optimal) sample lens so there is room to improve
    params = tpu_cooke.params
    tpu_cooke.update_params(params.replace(cv=params.cv * 1.05))

    p = OptimizationProblem(tpu_cooke)
    p.add_operand(operand_type="rms_spot_size", target=0, weight=1,
                  input_data={"surface_number": -1, "Hx": 0, "Hy": 0.0,
                              "num_rays": 4, "wavelength": 0.55})
    p.add_operand(operand_type="f2", target=50.0, weight=0.1)
    for s in (1, 2, 3, 4, 5, 6):
        p.add_variable(tpu_cooke, "radius", surface_number=s)

    before = float(p.sum_squared())
    res = AdamOptimizer(p, lr=1e-3).optimize(n_steps=150)
    assert res.success
    assert res.loss_history[-1] < before
    assert np.all(np.isfinite(res.loss_history))


def test_scipy_optimizer_converges_singlet():
    """Design a singlet focal length with scipy minimize."""
    import math

    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=60.0, thickness=5.0, material=1.52,
                     is_stop=True)
    lens.add_surface(index=2, radius=-60.0, thickness=55.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)

    p = OptimizationProblem(lens)
    p.add_operand(operand_type="f2", target=75.0, weight=1)
    p.add_variable(lens, "radius", surface_number=1)
    p.add_variable(lens, "radius", surface_number=2)

    res = OptimizerGeneric(p).optimize(maxiter=200, tol=1e-12)
    assert res.success or res.fun < 1e-8
    f2 = float(lens.paraxial.f2())
    assert abs(f2 - 75.0) < 1e-3


def test_least_squares_with_bounds(tpu_cooke):
    p = OptimizationProblem(tpu_cooke)
    p.add_operand(operand_type="f2", target=52.0, weight=1)
    p.add_variable(tpu_cooke, "radius", surface_number=1, min_val=18.0,
                   max_val=30.0)
    res = LeastSquares(p).optimize(maxiter=100)
    assert res.cost < 1e-8
    r = float(p.variables[0].get(tpu_cooke.params))
    assert 18.0 <= r <= 30.0
