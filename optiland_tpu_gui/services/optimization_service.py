"""Optimization panel backend (reference
`optiland_gui/services/optimization_service.py:1-882`): builds an
`OptimizationProblem` from declarative operand/variable rows, runs a chosen
optimizer, and reports merit history + result tables — headless."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class OperandRow:
    operand_type: str
    target: float | None = None
    weight: float = 1.0
    min_val: float | None = None
    max_val: float | None = None
    input_data: dict = field(default_factory=dict)


@dataclass
class VariableRow:
    variable_type: str
    kwargs: dict = field(default_factory=dict)


class OptimizationService:
    OPTIMIZERS = ["generic", "least_squares", "dual_annealing",
                  "differential_evolution", "basin_hopping", "shgo",
                  "orthogonal_descent", "adam", "sgd"]

    def __init__(self, connector):
        self.connector = connector
        self.operands: list[OperandRow] = []
        self.variables: list[VariableRow] = []
        self.merit_history: list[float] = []

    # -- declarative problem setup ---------------------------------------
    def available_operand_types(self) -> list[str]:
        from optiland_tpu.optimization.operands import REGISTRY

        return sorted(REGISTRY)

    def available_variable_types(self) -> list[str]:
        from optiland_tpu.optimization.variables import (
            _DEFAULT_SCALERS,
            _GEOM_COEFF_KINDS,
        )

        extra = ["asphere_coeff", "material", "norm_radius"]
        return sorted(set(_DEFAULT_SCALERS) | set(_GEOM_COEFF_KINDS)
                      | set(extra))

    def add_operand(self, operand_type: str, target=None, weight=1.0,
                    min_val=None, max_val=None, **input_data) -> None:
        self.operands.append(OperandRow(operand_type, target, weight,
                                        min_val, max_val, input_data))

    def add_variable(self, variable_type: str, **kwargs) -> None:
        self.variables.append(VariableRow(variable_type, kwargs))

    def clear(self) -> None:
        self.operands.clear()
        self.variables.clear()
        self.merit_history.clear()

    def build_problem(self):
        from optiland_tpu.optimization.problem import OptimizationProblem

        optic = self.connector.get_optic()
        problem = OptimizationProblem()
        for row in self.operands:
            problem.add_operand(operand_type=row.operand_type,
                                target=row.target, weight=row.weight,
                                min_val=row.min_val, max_val=row.max_val,
                                input_data=dict(row.input_data))
        for row in self.variables:
            problem.add_variable(optic, row.variable_type, **row.kwargs)
        return problem

    # -- run -------------------------------------------------------------
    def run(self, optimizer: str = "generic", **opt_kwargs):
        """One undoable optimization run; returns the scipy-style result.
        Merit per evaluation is collected in `merit_history`."""
        import optiland_tpu.optimization.optimizers as opts

        problem = self.build_problem()
        self.merit_history = [float(problem.sum_squared())]
        self.connector.begin_change()

        cls = {
            "generic": opts.OptimizerGeneric,
            "least_squares": opts.LeastSquares,
            "dual_annealing": opts.DualAnnealing,
            "differential_evolution": opts.DifferentialEvolution,
            "basin_hopping": opts.BasinHopping,
            "shgo": opts.SHGO,
            "orthogonal_descent": opts.OrthogonalDescent,
            "adam": opts.AdamOptimizer,
            "sgd": opts.SGDOptimizer,
        }[optimizer]
        opt = cls(problem)
        result = opt.optimize(**opt_kwargs)
        self.merit_history.append(float(problem.sum_squared()))
        self.connector.notify_changed()
        return result

    def info(self):
        """Operand/variable/merit tables (reference `problem.info`)."""
        return self.build_problem().info()
