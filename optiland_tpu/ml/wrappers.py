"""Hybrid physics-ML wrapper: the lens as a differentiable module.

TPU-native counterpart of the reference `OpticalSystemModule`
(`optiland/ml/wrappers.py:32-155`), which wraps an OptimizationProblem in a
torch `nn.Module`: variables become `nn.Parameter`s, `forward()` syncs them
into the optic and returns the merit, and `apply_bounds()` clamps post-step.

The JAX re-design keeps the same three capabilities but as pure functions —
which is what lets the lens compose with any JAX NN (flax/haiku/equinox)
under one `jax.value_and_grad`:

  - `module.parameters()`    -> the trainable leaf (scaled variable vector)
  - `module.loss(x)`         -> scalar merit, jittable/differentiable;
                                `module(x)` is an alias (torch forward())
  - `module.apply_bounds(x)` -> clamped vector (reference bounds clamp)
  - `module.fit(...)`        -> optax training loop (Adam by default)
  - `module.system_params(x)`-> the full SystemParams pytree with the
                                variables written in, for custom objectives
                                (e.g. trace + neural image prior losses)

A custom `objective_fn(static, params) -> scalar` replaces the reference's
`objective_fn` hook; the default is the problem's weighted sum of squares.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.optimization import variables as vars_mod


class OpticalSystemModule:
    """Expose an optic's optimization variables as trainable parameters.

    Args:
        optic: the `Optic` (its `build()` supplies static + params).
        problem: an `OptimizationProblem` defining variables (and, unless
            `objective_fn` is given, the merit operands).
        objective_fn: optional `(static, params) -> scalar` loss override.
    """

    def __init__(self, optic, problem, objective_fn=None):
        self.optic = optic
        self.problem = problem
        if problem.optic is None:
            problem.optic = optic
        self.static, self._params0 = optic.build()
        self.variables = list(problem.variables)
        self.objective_fn = objective_fn
        self._loss_jit = jax.jit(self.loss)
        self._bounds = self._scaled_bounds()

    # -- parameters ---------------------------------------------------------
    def parameters(self) -> jax.Array:
        """The trainable leaf: scaled variable vector (torch: ParameterList)."""
        return vars_mod.initial_values(self.variables, self.optic.params)

    def system_params(self, x):
        """Full SystemParams pytree with the variable vector written in."""
        return vars_mod.apply_all(self.variables, self._params0, x)

    # -- forward ------------------------------------------------------------
    def loss(self, x, params=None) -> jax.Array:
        """Differentiable scalar loss at variable vector `x`.

        Mirrors the reference forward(): sync params -> update optics ->
        objective (`ml/wrappers.py:131-155`). Pure: safe under jit/grad/vmap.
        """
        base = self._params0 if params is None else params
        p = vars_mod.apply_all(self.variables, base, x)
        if self.objective_fn is not None:
            return self.objective_fn(self.static, p)
        return self._problem_merit(p)

    __call__ = loss  # torch forward() ergonomics

    def _problem_merit(self, p):
        from optiland_tpu.optimization import operands as ops

        total = jnp.asarray(0.0, p.cv.dtype)
        for o in self.problem.operands:
            val = ops.REGISTRY[o.operand_type](self.static, p, **o.input_data)
            d = o.delta_fn(jnp.asarray(val, p.cv.dtype))
            total = total + o.weight * d * d
        return total

    # -- bounds -------------------------------------------------------------
    def _scaled_bounds(self):
        lo, hi = [], []
        for v in self.variables:
            lo.append(-np.inf if v.bounds[0] is None
                      else float(v.scaler.scale(v.bounds[0])))
            hi.append(np.inf if v.bounds[1] is None
                      else float(v.scaler.scale(v.bounds[1])))
        lo = jnp.asarray(lo)
        hi = jnp.asarray(hi)
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    def apply_bounds(self, x) -> jax.Array:
        """Clamp the scaled vector to the variable bounds (reference
        `apply_bounds`, `ml/wrappers.py:108-130`)."""
        lo, hi = self._bounds
        return jnp.clip(x, lo, hi)

    # -- training -----------------------------------------------------------
    def fit(self, steps: int = 100, lr: float = 1e-2, optimizer=None,
            callback=None):
        """Optax loop on the variable vector; bounds clamped after each step
        (the reference's torch-Adam pattern, `optimizer/torch/base.py`).

        Returns (x, losses). Installs the solution into the optic.
        """
        import optax

        tx = optax.adam(lr) if optimizer is None else optimizer
        lo, hi = self._bounds

        @jax.jit
        def step(x, opt_state):
            loss, g = jax.value_and_grad(self.loss)(x)
            updates, opt_state = tx.update(g, opt_state, x)
            x = optax.apply_updates(x, updates)
            x = jnp.clip(x, lo, hi)
            return x, opt_state, loss

        x = self.parameters()
        opt_state = tx.init(x)
        losses = []
        for i in range(steps):
            x, opt_state, loss = step(x, opt_state)
            losses.append(float(loss))
            if callback is not None:
                callback(i, float(loss))
        self.sync_to_optic(x)
        return x, losses

    def sync_to_optic(self, x) -> None:
        """Write a solution vector back into the live optic (reference
        `_sync_params_to_problem`)."""
        self.optic.update_params(self.system_params(jnp.asarray(x)))

    # -- flax adapter --------------------------------------------------------
    def as_flax_module(self):
        """A `flax.linen.Module` whose single param is the scaled vector —
        for embedding the lens in a flax model tree."""
        import flax.linen as nn

        module = self
        x0 = np.asarray(jax.device_get(self.parameters()))

        class _OpticalLayer(nn.Module):
            @nn.compact
            def __call__(self):
                x = self.param("variables", lambda _key: jnp.asarray(x0))
                return module.loss(x)

        return _OpticalLayer()
