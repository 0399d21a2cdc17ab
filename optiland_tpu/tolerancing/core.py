"""Tolerancing core: perturbations + compensators + operands, batched.

Re-design of the reference's `tolerancing/` (`core.py:18-145`,
`perturbation.py:19-172`, `compensator.py:15-66`). The reference applies one
perturbation draw at a time to a mutable optic and re-optimizes serially; here
the entire (perturb -> compensate -> evaluate) pipeline is ONE jitted
function of a perturbation vector, vmapped over the draw axis and shardable
over a device mesh — the pod-scale Monte-Carlo workload of BASELINE config 5.

Compensation runs a fixed number of damped Gauss-Newton steps on the
compensator variables inside jit (data-independent iteration count keeps it
batched; the reference runs scipy to tolerance instead).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.optimization import operands as ops
from optiland_tpu.optimization import variables as vars_mod
from optiland_tpu.optimization.problem import OperandSpec
from optiland_tpu.optimization.variables import Variable


# -- samplers (reference `perturbation.py:19-172`) --------------------------

class BaseSampler:
    def sample(self, rng: np.random.Generator, n: int) -> np.ndarray:
        raise NotImplementedError


@dataclass
class ScalarSampler(BaseSampler):
    value: float

    size = 1

    def sample(self, rng, n):
        return np.full(n, self.value)


@dataclass
class RangeSampler(BaseSampler):
    start: float
    end: float
    steps: int

    @property
    def size(self):
        return self.steps

    def sample(self, rng, n):
        grid = np.linspace(self.start, self.end, self.steps)
        return np.resize(grid, n)


@dataclass
class NormalSampler(BaseSampler):
    mean: float
    std: float

    def sample(self, rng, n):
        return rng.normal(self.mean, self.std, n)


@dataclass
class UniformSampler(BaseSampler):
    low: float
    high: float

    def sample(self, rng, n):
        return rng.uniform(self.low, self.high, n)


@dataclass
class Perturbation:
    variable: Variable
    sampler: BaseSampler

    def __str__(self):
        return str(self.variable)


class Tolerancing:
    """Perturbations + compensators + operands over one optic."""

    def __init__(self, optic, compensator_steps: int = 12,
                 compensator_damping: float = 1e-6):
        self.optic = optic
        self.perturbations: list[Perturbation] = []
        self.compensators: list[Variable] = []
        self.operands: list[OperandSpec] = []
        self.compensator_steps = compensator_steps
        self.compensator_damping = compensator_damping
        self._nominal_params = optic.params
        self._compiled = None

    def add_perturbation(self, variable_type: str, sampler: BaseSampler,
                         **kwargs):
        var = Variable(kind=variable_type,
                       surface_number=kwargs.pop("surface_number"),
                       coeff_number=kwargs.pop("coeff_number", 0),
                       extra=kwargs)
        self.perturbations.append(Perturbation(var, sampler))
        self._compiled = None

    def add_compensator(self, variable_type: str, **kwargs):
        self.compensators.append(
            Variable(kind=variable_type,
                     surface_number=kwargs.pop("surface_number"),
                     coeff_number=kwargs.pop("coeff_number", 0),
                     extra=kwargs)
        )
        self._compiled = None

    def add_operand(self, operand_type: str, input_data: dict = None,
                    target: float = None, weight: float = 1.0,
                    min_val: float = None, max_val: float = None):
        spec = OperandSpec(operand_type, target, min_val, max_val, weight,
                           input_data or {})
        if target is None and min_val is None and max_val is None:
            # reference behavior: default target = nominal value
            static, params = self.optic.build()
            spec.target = float(np.asarray(
                ops.REGISTRY[operand_type](static, params, **spec.input_data)
            ))
        self.operands.append(spec)
        self._compiled = None

    # -- compiled pipeline --------------------------------------------------
    def _compile(self):
        if self._compiled is not None:
            return self._compiled
        static, _ = self.optic.build()
        perturb_vars = [p.variable for p in self.perturbations]
        comp_vars = list(self.compensators)
        operands = list(self.operands)
        steps = self.compensator_steps
        damping = self.compensator_damping

        def operand_values(params):
            return jnp.stack([
                jnp.asarray(
                    ops.REGISTRY[o.operand_type](static, params, **o.input_data),
                    params.cv.dtype,
                )
                for o in operands
            ])

        def residuals(params):
            vals = operand_values(params)
            deltas = jnp.stack(
                [o.delta_fn(vals[i]) for i, o in enumerate(operands)]
            )
            w = jnp.asarray([o.weight for o in operands], vals.dtype)
            return w * deltas

        def apply_perturbation(params, draw):
            for i, v in enumerate(perturb_vars):
                params = v.set(params, draw[i])
            return params

        def compensate(params):
            """Fixed-count damped Gauss-Newton on the compensator variables."""
            if not comp_vars:
                return params, jnp.zeros((0,), params.cv.dtype)
            x0 = vars_mod.initial_values(comp_vars, params)

            def res_of_x(x, params):
                p = vars_mod.apply_all(comp_vars, params, x)
                return residuals(p)

            def body(x, _):
                r = res_of_x(x, params)
                Jmat = jax.jacfwd(lambda xx: res_of_x(xx, params))(x)
                JTJ = Jmat.T @ Jmat + damping * jnp.eye(x.shape[0], dtype=x.dtype)
                JTr = Jmat.T @ r
                step = jnp.linalg.solve(JTJ, JTr)
                return x - step, None

            x, _ = jax.lax.scan(body, x0, None, length=steps)
            return vars_mod.apply_all(comp_vars, params, x), x

        def pipeline(nominal_params, draw):
            p = apply_perturbation(nominal_params, draw)
            p, comp_x = compensate(p)
            return operand_values(p), comp_x

        self._compiled = {
            "pipeline": pipeline,
            "pipeline_batch": jax.jit(jax.vmap(pipeline, in_axes=(None, 0))),
            "operand_values": jax.jit(operand_values),
        }
        return self._compiled

    # -- reference-style serial interface -----------------------------------
    def apply(self, draw):
        """Apply one perturbation draw (+compensation) to the optic in place."""
        c = self._compile()
        static, _ = self.optic.build()
        vals, _ = jax.jit(c["pipeline"])(self._nominal_params,
                                         jnp.asarray(draw))
        return vals

    def evaluate(self):
        c = self._compile()
        return c["operand_values"](self.optic.params)

    def reset(self):
        self.optic.update_params(self._nominal_params)

    def draw_table(self, num: int, seed: int = 0) -> np.ndarray:
        """(num, P) perturbation draws from each sampler."""
        rng = np.random.default_rng(seed)
        cols = [p.sampler.sample(rng, num) for p in self.perturbations]
        return np.stack(cols, axis=1) if cols else np.zeros((num, 0))
