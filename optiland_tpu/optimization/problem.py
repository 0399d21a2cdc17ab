"""OptimizationProblem: operands + variables -> one jitted merit graph.

API-compatible with the reference's `OptimizationProblem`
(`optimization/problem.py:27-380`): `add_operand(operand_type, target,
weight, input_data)`, `add_variable(optic, kind, **kwargs)`, `fun_array /
sum_squared / rss`. The TPU-native difference: instead of re-tracing per
operand through mutable objects (with the BatchedRayEvaluator dedup engine),
the whole merit — every operand, every trace — compiles into ONE jitted
function of the scaled variable vector, with `jax.value_and_grad` supplying
exact analytic gradients to every optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.optimization import operands as ops
from optiland_tpu.optimization import variables as vars_mod
from optiland_tpu.optimization.variables import Variable


@dataclass
class OperandSpec:
    operand_type: str
    target: float | None = None
    min_val: float | None = None
    max_val: float | None = None
    weight: float = 1.0
    input_data: dict = field(default_factory=dict)

    def delta_fn(self, value):
        """Signed deviation used in the merit (reference Operand.delta)."""
        if self.target is not None:
            return value - self.target
        lo = -jnp.inf if self.min_val is None else self.min_val
        hi = jnp.inf if self.max_val is None else self.max_val
        # inequality operand: penalize only outside the [lo, hi] band
        return jnp.maximum(lo - value, 0.0) + jnp.maximum(value - hi, 0.0)


class OptimizationProblem:
    """Merit function definition over one optic."""

    def __init__(self, optic=None):
        self.optic = optic
        self.operands: list[OperandSpec] = []
        self.variables: list[Variable] = []
        self._compiled = None
        self.initial_value = 0.0

    # -- builder -----------------------------------------------------------
    def add_operand(self, operand_type=None, target=None, min_val=None,
                    max_val=None, weight=1.0, input_data=None):
        if operand_type not in ops.REGISTRY:
            raise ValueError(f"Unknown operand type {operand_type!r}")
        self.operands.append(OperandSpec(operand_type, target, min_val,
                                         max_val, weight, input_data or {}))
        self._compiled = None

    def add_variable(self, optic, variable_type, **kwargs):
        if self.optic is None:
            self.optic = optic
        scaler = kwargs.pop("scaler", None)
        surface_number = kwargs.pop("surface_number")
        coeff_number = kwargs.pop("coeff_number", 0)
        min_val = kwargs.pop("min_val", None)
        max_val = kwargs.pop("max_val", None)
        from optiland_tpu.optimization.variables import (
            _GEOM_COEFF_KINDS,
            geom_coeff_offset,
        )

        if variable_type in _GEOM_COEFF_KINDS and "offset" not in kwargs:
            kwargs["offset"] = geom_coeff_offset(
                optic.static, variable_type, surface_number)
        self.variables.append(Variable(
            kind=variable_type, surface_number=surface_number,
            coeff_number=coeff_number, scaler=scaler,
            bounds=(min_val, max_val), extra=kwargs,
        ))
        self._compiled = None

    def clear_operands(self):
        self.operands = []
        self._compiled = None

    def clear_variables(self):
        self.variables = []
        self._compiled = None

    # -- compiled access ---------------------------------------------------
    def _compile(self):
        """Build jitted fun_array(x) and value_and_grad of sum_squared."""
        if self._compiled is not None:
            return self._compiled
        static, params0 = self.optic.build()
        operands = list(self.operands)
        variables = list(self.variables)

        def values(x_scaled, params):
            p = vars_mod.apply_all(variables, params, x_scaled)
            return jnp.stack([
                jnp.asarray(
                    ops.REGISTRY[o.operand_type](static, p, **o.input_data),
                    p.cv.dtype,
                )
                for o in operands
            ])

        def deltas(x_scaled, params):
            vals = values(x_scaled, params)
            return jnp.stack(
                [o.delta_fn(vals[i]) for i, o in enumerate(operands)]
            )

        def fun_array(x_scaled, params):
            # reference semantics (`problem.py:141-172`): weight * delta^2
            d = deltas(x_scaled, params)
            w = jnp.asarray([o.weight for o in operands], d.dtype)
            return w * d * d

        def residuals(x_scaled, params):
            # reference `residual_vector`: weight * delta (note: the
            # reference's own sum_squared weighs deltas linearly, not
            # quadratically; we mirror both behaviors exactly)
            d = deltas(x_scaled, params)
            w = jnp.asarray([o.weight for o in operands], d.dtype)
            return w * d

        def sum_squared(x_scaled, params):
            return jnp.sum(fun_array(x_scaled, params))

        self._compiled = {
            "values": jax.jit(values),
            "fun_array": jax.jit(fun_array),
            "residuals": jax.jit(residuals),
            "sum_squared": jax.jit(sum_squared),
            "value_and_grad": jax.jit(jax.value_and_grad(sum_squared)),
            "residual_jac": jax.jit(jax.jacfwd(residuals)),
        }
        return self._compiled

    @property
    def params(self):
        return self.optic.params

    def x0(self):
        """Scaled starting vector."""
        return vars_mod.initial_values(self.variables, self.optic.params)

    # -- reference-compatible queries --------------------------------------
    def fun_array(self):
        c = self._compile()
        return c["fun_array"](self.x0(), self.optic.params)

    def operand_values(self):
        c = self._compile()
        return c["values"](self.x0(), self.optic.params)

    def residual_vector(self):
        c = self._compile()
        return c["residuals"](self.x0(), self.optic.params)

    def sum_squared(self):
        c = self._compile()
        return c["sum_squared"](self.x0(), self.optic.params)

    def rss(self):
        return jnp.sqrt(self.sum_squared())

    def update_optics(self):
        """No-op for API compatibility (params are pure)."""

    def apply(self, x_scaled):
        """Install a solution vector into the optic."""
        params = vars_mod.apply_all(self.variables, self.optic.params,
                                    jnp.asarray(x_scaled))
        self.optic.update_params(params)

    def info(self):
        c = self._compile()
        vals = np.asarray(c["values"](self.x0(), self.optic.params))
        print(f"{'operand':24s} {'target':>12s} {'weight':>8s} {'value':>14s}")
        for o, v in zip(self.operands, vals):
            t = "-" if o.target is None else f"{o.target:.6g}"
            print(f"{o.operand_type:24s} {t:>12s} {o.weight:>8.3g} {v:>14.6g}")
        print(f"{'variable':40s} {'value':>14s}")
        for var in self.variables:
            print(f"{str(var):40s} {float(var.get(self.optic.params)):>14.6g}")
