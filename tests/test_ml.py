"""Hybrid physics-ML wrapper tests (reference `tests/test_ml.py` analogue:
parameter creation, default loss == problem.sum_squared, training decreases
loss, bounds hold, joint lens+NN optimization)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optiland_tpu.ml import OpticalSystemModule
from optiland_tpu.models import CookeTriplet
from optiland_tpu.optimization import OptimizationProblem


def setup_problem(min_val=1.0, max_val=10.0, target=12.0):
    lens = CookeTriplet()
    problem = OptimizationProblem()
    problem.add_variable(lens, "thickness", surface_number=1,
                         min_val=min_val, max_val=max_val)
    problem.add_operand(operand_type="f2", target=target, weight=1.0)
    return problem, lens


class TestOpticalSystemModule:
    def test_parameter_creation(self):
        problem, lens = setup_problem()
        module = OpticalSystemModule(lens, problem)
        x = module.parameters()
        assert x.shape == (1,)
        v = problem.variables[0]
        assert np.isclose(float(x[0]),
                          float(v.scaler.scale(v.get(lens.params))))

    def test_default_loss_matches_problem(self):
        problem, lens = setup_problem()
        module = OpticalSystemModule(lens, problem)
        expected = float(problem.sum_squared())
        actual = float(module.loss(module.parameters()))
        assert np.isclose(expected, actual, rtol=1e-6)

    def test_custom_objective_fn(self):
        problem, lens = setup_problem()

        def objective(static, params):
            return jnp.sum(params.thickness[1] ** 2)

        module = OpticalSystemModule(lens, problem, objective_fn=objective)
        t1 = float(lens.params.thickness[1])
        assert np.isclose(float(module.loss(module.parameters())), t1 * t1,
                          rtol=1e-6)

    def test_loss_is_differentiable(self):
        problem, lens = setup_problem()
        module = OpticalSystemModule(lens, problem)
        g = jax.grad(module.loss)(module.parameters())
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0

    def test_fit_decreases_loss_and_respects_bounds(self):
        problem, lens = setup_problem(min_val=1.0, max_val=10.0)
        module = OpticalSystemModule(lens, problem)
        x0 = module.parameters()
        loss0 = float(module.loss(x0))
        x, losses = module.fit(steps=30, lr=0.05)
        assert losses[-1] < loss0
        assert np.all(np.isfinite(losses))
        # unscaled thickness stays within bounds
        t = float(problem.variables[0].get(lens.params))
        assert 1.0 - 1e-6 <= t <= 10.0 + 1e-6

    def test_apply_bounds_clamps(self):
        problem, lens = setup_problem(min_val=2.0, max_val=3.0)
        module = OpticalSystemModule(lens, problem)
        v = problem.variables[0]
        too_big = jnp.asarray([float(v.scaler.scale(100.0))])
        clamped = module.apply_bounds(too_big)
        assert np.isclose(float(v.scaler.inverse_scale(clamped[0])), 3.0)

    def test_joint_lens_plus_nn(self):
        """Joint optimization of lens thickness and a tiny NN: the lens merit
        plus a learned scalar head both decrease under one Adam loop —
        the BASELINE north-star 'hybrid physics-ML optimization' smoke."""
        import optax

        problem, lens = setup_problem()
        module = OpticalSystemModule(lens, problem)

        def nn_forward(w, feats):
            h = jnp.tanh(feats @ w["w1"])
            return jnp.sum(h @ w["w2"])

        key = jax.random.PRNGKey(0)
        w = {
            "w1": jax.random.normal(key, (2, 4)) * 0.1,
            "w2": jax.random.normal(jax.random.fold_in(key, 1), (4, 1)) * 0.1,
        }
        feats = jnp.asarray([1.0, -0.5])

        def total_loss(leaves):
            x, w = leaves
            return module.loss(x) + (nn_forward(w, feats) - 0.7) ** 2

        tx = optax.adam(0.05)
        leaves = (module.parameters(), w)
        opt_state = tx.init(leaves)

        @jax.jit
        def step(leaves, opt_state):
            loss, g = jax.value_and_grad(total_loss)(leaves)
            updates, opt_state = tx.update(g, opt_state, leaves)
            return optax.apply_updates(leaves, updates), opt_state, loss

        losses = []
        for _ in range(40):
            leaves, opt_state, loss = step(leaves, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.all(np.isfinite(losses))

    def test_flax_adapter(self):
        problem, lens = setup_problem()
        module = OpticalSystemModule(lens, problem)
        fm = module.as_flax_module()
        variables = fm.init(jax.random.PRNGKey(0))
        out = fm.apply(variables)
        assert np.isfinite(float(out))
        assert np.isclose(float(out), float(module.loss(module.parameters())),
                          rtol=1e-6)
