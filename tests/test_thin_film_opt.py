"""Thin-film optimization (operands, optimizer, needle) + tolerancing tests."""

import numpy as np

import optiland_tpu  # noqa: F401
from optiland_tpu.thin_film import (
    NeedleSynthesis,
    ThinFilmMonteCarlo,
    ThinFilmOptimizer,
    ThinFilmSensitivity,
    ThinFilmStack,
)


def _ar_stack():
    """Glass substrate with a single MgF2-like quarter-wave layer start."""
    stack = ThinFilmStack(incident_material="air", substrate_material=1.52)
    stack.add_layer(1.38, 0.10)  # deliberately off-QWOT start
    return stack


def test_optimizer_reduces_merit_and_hits_ar_target():
    stack = _ar_stack()
    opt = ThinFilmOptimizer(stack)
    opt.add_variable(0, min_nm=5.0, max_nm=500.0)
    opt.add_operand(property="R", wavelength_nm=550.0, target_type="equal",
                    value=0.0, polarization="u")
    m0 = opt.sum_squared()
    opt.optimize(max_iter=100)
    m1 = opt.sum_squared()
    assert m1 < m0
    # single-layer n=1.38 on n=1.52: ideal QWOT residual reflectance ~1.26%
    R = float(np.asarray(stack.reflectance_nm_deg(550.0)))
    assert R < 0.015
    # optimum thickness near QWOT = 550/(4*1.38) ~ 99.6 nm
    t_nm = float(np.asarray(stack.layers[0].thickness_um)) * 1e3
    assert 80.0 < t_nm < 120.0


def test_operand_target_types():
    stack = _ar_stack()
    opt = ThinFilmOptimizer(stack)
    opt.add_variable(0)
    opt.add_operand(property="R", wavelength_nm=[500.0, 550.0, 600.0],
                    target_type="below", value=0.02)
    opt.add_operand(property="T", wavelength_nm=550.0, target_type="over",
                    value=0.97)
    r = opt.fun_array()
    assert r.shape == (4,)
    opt.optimize(max_iter=60)
    assert opt.sum_squared() < 1e-5


def test_needle_synthesis_improves_merit():
    """Needle synthesis on a 2-layer AR start must monotonically reduce the
    merit and insert at least one needle for a broadband target."""
    stack = ThinFilmStack(incident_material="air", substrate_material=1.52)
    stack.add_layer_qwot(1.38, 0.55)
    stack.add_layer_qwot(2.35, 0.55)

    needle = NeedleSynthesis(stack, needle_material=2.35,
                             positions_per_layer=3, max_needles=3)
    needle.add_target("R", wavelength_nm=list(np.linspace(450, 650, 9)),
                      target_type="equal", value=0.0)
    res = needle.run(max_iterations=2)
    h = res.merit_history
    assert len(h) >= 1
    assert all(h[i + 1] <= h[i] * (1 + 1e-9) for i in range(len(h) - 1))
    assert res.final_merit < h[0] or len(h) == 1


def test_monte_carlo_vectorized():
    stack = _ar_stack()
    ThinFilmOptimizer(stack).add_variable(0).add_operand(
        property="R", wavelength_nm=550.0, target_type="equal",
        value=0.0).optimize(max_iter=50)
    mc = ThinFilmMonteCarlo(stack)
    mc.add_perturbation(0, sigma_nm=2.0)
    mc.add_operand("R", wavelength_nm=550.0)
    out = mc.run(num_trials=512, seed=1)
    assert out["values"].shape == (512, 1)
    # at optimum, perturbations can only increase R: mean above optimum value
    r_opt = float(np.asarray(stack.reflectance_nm_deg(550.0)))
    assert out["mean"][0] >= r_opt - 1e-9
    assert out["std"][0] > 0


def test_sensitivity_sweep():
    stack = _ar_stack()
    sens = ThinFilmSensitivity(stack)
    sens.add_perturbation(0, range_nm=10.0)
    sens.add_operand("R", wavelength_nm=[500.0, 600.0])
    out = sens.run(num_steps=7)
    assert 0 in out
    assert out[0]["values"].shape == (7, 2)
    assert np.all(np.isfinite(out[0]["values"]))


def test_tmm_parity_reference_after_opt(reference):
    """Optimized stack spectra still agree with the reference TMM."""
    stack = _ar_stack()
    ThinFilmOptimizer(stack).add_variable(0).add_operand(
        property="R", wavelength_nm=550.0, target_type="equal",
        value=0.0).optimize(max_iter=50)

    from optiland.materials import IdealMaterial
    from optiland.thin_film import ThinFilmStack as RefStack

    ref = RefStack(incident_material=IdealMaterial(1.0),
                   substrate_material=IdealMaterial(1.52))
    ref.add_layer(IdealMaterial(1.38),
                  float(np.asarray(stack.layers[0].thickness_um)))
    wl = np.linspace(0.45, 0.65, 11)
    want = np.asarray(ref.reflectance(wl, 0.0, "s")).squeeze()
    got = np.asarray(stack.reflectance(wl, 0.0, "s"))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
