"""Optimization panel backend (reference
`optiland_gui/services/optimization_service.py:1-882`): declarative
operand/variable rows, metadata registries that drive the panel's dynamic
forms, current-value queries, optimizer catalog with per-method settings
and bounds validation, and an asynchronous run with progress reporting and
cancellation — all headless (threads instead of QThread; the Qt panel
subscribes to the same callbacks)."""

from __future__ import annotations

import inspect
import threading
from dataclasses import dataclass, field

from optiland_tpu_gui.connector import Signal


@dataclass
class OperandRow:
    operand_type: str
    target: float | None = None
    weight: float = 1.0
    min_val: float | None = None
    max_val: float | None = None
    input_data: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {"operand_type": self.operand_type, "target": self.target,
                "weight": self.weight, "min_val": self.min_val,
                "max_val": self.max_val, "input_data": dict(self.input_data)}


@dataclass
class VariableRow:
    variable_type: str
    kwargs: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {"variable_type": self.variable_type,
                "kwargs": dict(self.kwargs)}


class _CancelledError(Exception):
    pass


class OptimizationService:
    """Headless core of the optimization panel."""

    def __init__(self, connector):
        self.connector = connector
        self.operands: list[OperandRow] = []
        self.variables: list[VariableRow] = []
        self.merit_history: list[float] = []
        # async-run machinery (reference `_OptimizationWorker`)
        self.progress = Signal()   # emits (iteration, merit)
        self.finished = Signal()   # emits (result)
        self.failed = Signal()     # emits (exception)
        self._thread: threading.Thread | None = None
        self._cancel = threading.Event()
        self._result = None

    # ------------------------------------------------------------------
    # metadata registries (drive the panel's dynamic forms)
    # ------------------------------------------------------------------
    def available_operand_types(self) -> list[str]:
        from optiland_tpu.optimization.operands import REGISTRY

        return sorted(REGISTRY)

    def get_operand_metadata(self, op_type: str) -> dict:
        """Input-field schema for one operand type, derived from the
        registered function's signature (everything after the implicit
        (static, params) pair is user input — same idea as the reference's
        hand-maintained `_init_operand_metadata`, but kept in sync with the
        registry automatically)."""
        from optiland_tpu.optimization.operands import REGISTRY

        fn = REGISTRY[op_type]
        sig = inspect.signature(fn)
        fields: dict[str, dict] = {}
        for name, p in list(sig.parameters.items())[2:]:  # skip static,params
            default = (None if p.default is inspect.Parameter.empty
                       else p.default)
            fields[name] = {
                "default": default,
                "required": p.default is inspect.Parameter.empty,
            }
        return {"name": op_type, "fields": fields,
                "doc": inspect.getdoc(fn) or ""}

    def get_default_input_data(self, op_type: str) -> dict:
        """Starting input_data for a new operand row (required fields get
        type-appropriate zeros, mirroring the reference's defaults)."""
        meta = self.get_operand_metadata(op_type)
        out = {}
        for name, f in meta["fields"].items():
            if f["default"] is not None:
                out[name] = f["default"]
            elif f["required"]:
                out[name] = 0.550 if "wavelength" in name else 0.0
        return out

    def validate_operand_input_data(self, op_type: str,
                                    input_data: dict) -> str | None:
        """None if valid, else a human-readable problem description
        (reference `validate_operand_input_data`)."""
        from optiland_tpu.optimization.operands import REGISTRY

        if op_type not in REGISTRY:
            return f"unknown operand type {op_type!r}"
        meta = self.get_operand_metadata(op_type)
        missing = [n for n, f in meta["fields"].items()
                   if f["required"] and n not in input_data]
        if missing:
            return f"missing required inputs: {', '.join(missing)}"
        unknown = [n for n in input_data if n not in meta["fields"]]
        if unknown:
            return f"unknown inputs: {', '.join(unknown)}"
        return None

    def available_variable_types(self) -> list[str]:
        from optiland_tpu.optimization.variables import (
            _DEFAULT_SCALERS,
            _GEOM_COEFF_KINDS,
        )

        extra = ["asphere_coeff", "material", "norm_radius"]
        return sorted(set(_DEFAULT_SCALERS) | set(_GEOM_COEFF_KINDS)
                      | set(extra))

    def get_variable_metadata(self, var_type: str) -> dict:
        """Which kwargs a variable kind needs (reference
        `get_variable_metadata`)."""
        from optiland_tpu.optimization.variables import _GEOM_COEFF_KINDS

        needs_coeff = (var_type in _GEOM_COEFF_KINDS
                       or var_type in ("asphere_coeff",))
        return {
            "name": var_type,
            "fields": {
                "surface_number": {"required": True, "default": 1},
                **({"coeff_number": {"required": True, "default": 0}}
                   if needs_coeff else {}),
                "min_val": {"required": False, "default": None},
                "max_val": {"required": False, "default": None},
            },
        }

    # ------------------------------------------------------------------
    # rows
    # ------------------------------------------------------------------
    def add_operand(self, operand_type: str, target=None, weight=1.0,
                    min_val=None, max_val=None, **input_data) -> None:
        self.operands.append(OperandRow(operand_type, target, weight,
                                        min_val, max_val, input_data))

    def set_operand(self, index: int, **updates) -> None:
        row = self.operands[index]
        for k, v in updates.items():
            if k == "input_data":
                row.input_data = dict(v)
            else:
                setattr(row, k, v)

    def remove_operand(self, index: int) -> None:
        self.operands.pop(index)

    def add_variable(self, variable_type: str, **kwargs) -> None:
        self.variables.append(VariableRow(variable_type, kwargs))

    def set_variable(self, index: int, **updates) -> None:
        row = self.variables[index]
        row.kwargs.update(updates.pop("kwargs", {}))
        for k, v in updates.items():
            setattr(row, k, v)

    def remove_variable(self, index: int) -> None:
        self.variables.pop(index)

    def clear(self) -> None:
        self.operands.clear()
        self.variables.clear()
        self.merit_history.clear()

    # ------------------------------------------------------------------
    # current-value queries (the panel's Value columns)
    # ------------------------------------------------------------------
    def get_operand_current_value(self, index: int) -> float | None:
        from optiland_tpu.optimization.operands import REGISTRY

        row = self.operands[index]
        optic = self.connector.get_optic()
        try:
            fn = REGISTRY[row.operand_type]
            return float(fn(optic.static, optic.params, **row.input_data))
        except Exception:
            return None

    def get_variable_current_value(self, index: int) -> float | None:
        from optiland_tpu.optimization.variables import Variable

        row = self.variables[index]
        optic = self.connector.get_optic()
        kw = dict(row.kwargs)
        try:
            var = Variable(
                kind=row.variable_type,
                surface_number=kw.pop("surface_number"),
                coeff_number=kw.pop("coeff_number", 0),
                bounds=(kw.pop("min_val", None), kw.pop("max_val", None)),
                extra=kw)
            return float(var.get(optic.params))
        except Exception:
            return None

    # ------------------------------------------------------------------
    # optimizer catalog (reference `get_optimizer_groups` /
    # `get_optimizer_metadata` / `validate_bounds_for_optimizer`)
    # ------------------------------------------------------------------
    OPTIMIZERS = ["generic", "least_squares", "dual_annealing",
                  "differential_evolution", "basin_hopping", "shgo",
                  "orthogonal_descent", "adam", "sgd"]

    _GROUPS = {
        "Local": ["generic", "least_squares", "orthogonal_descent"],
        "Global": ["dual_annealing", "differential_evolution",
                   "basin_hopping", "shgo"],
        "Gradient (optax)": ["adam", "sgd"],
    }
    _NEEDS_BOUNDS = {"dual_annealing", "differential_evolution", "shgo"}

    def get_optimizer_groups(self) -> dict[str, list[str]]:
        return {k: list(v) for k, v in self._GROUPS.items()}

    def get_optimizer_metadata(self, optimizer: str) -> dict:
        settings = {"maxiter": {"default": 1000, "kind": "int"},
                    "disp": {"default": False, "kind": "bool"}}
        if optimizer in ("generic", "least_squares"):
            settings["tol"] = {"default": 1e-3, "kind": "float"}
        if optimizer in ("adam", "sgd"):
            settings = {"n_steps": {"default": 100, "kind": "int"},
                        "learning_rate": {"default": 1e-2, "kind": "float"}}
        return {"name": optimizer,
                "requires_bounds": optimizer in self._NEEDS_BOUNDS,
                "supports_callback": True,
                "settings": settings}

    def validate_bounds_for_optimizer(self, optimizer: str) -> str | None:
        if optimizer not in self._NEEDS_BOUNDS:
            return None
        unbounded = [
            i for i, row in enumerate(self.variables)
            if row.kwargs.get("min_val") is None
            or row.kwargs.get("max_val") is None]
        if unbounded:
            return (f"{optimizer} requires finite bounds on every variable; "
                    f"variables {unbounded} are unbounded")
        return None

    # ------------------------------------------------------------------
    # problem build + run
    # ------------------------------------------------------------------
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
        if problem.optic is None:
            problem.optic = optic
        return problem

    def _optimizer_cls(self, optimizer: str):
        import optiland_tpu.optimization.optimizers as opts

        return {
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

    def run(self, optimizer: str = "generic", **opt_kwargs):
        """One undoable, synchronous optimization run; returns the
        scipy-style result.  Merit per iteration lands in `merit_history`
        and on the `progress` signal."""
        import jax.numpy as jnp

        problem = self.build_problem()
        self.merit_history = [float(problem.sum_squared())]
        self.connector.begin_change()
        self._cancel.clear()

        compiled = problem._compile()
        base_params = problem.params  # property: the optic's params pytree
        it = [0]

        def callback(*args, **kw):
            if self._cancel.is_set():
                raise _CancelledError
            try:
                if args:  # scipy passes the current iterate xk first
                    merit = float(compiled["sum_squared"](
                        jnp.asarray(args[0]), base_params))
                else:
                    merit = float(problem.sum_squared())
            except Exception:
                merit = float("nan")
            self.merit_history.append(merit)
            it[0] += 1
            self.progress.emit(it[0], merit)

        cls = self._optimizer_cls(optimizer)
        opt = cls(problem)
        if "callback" in inspect.signature(opt.optimize).parameters:
            opt_kwargs.setdefault("callback", callback)
        try:
            result = opt.optimize(**opt_kwargs)
        except _CancelledError:
            result = {"success": False, "message": "cancelled by user",
                      "fun": self.merit_history[-1]}
        self.merit_history.append(float(problem.sum_squared()))
        self.connector.notify_changed()
        return result

    # -- asynchronous run (the panel's Run/Stop buttons) -----------------
    def is_running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def run_async(self, optimizer: str = "generic", **opt_kwargs) -> None:
        if self.is_running():
            raise RuntimeError("an optimization is already running")

        def work():
            try:
                self._result = self.run(optimizer, **opt_kwargs)
                self.finished.emit(self._result)
            except Exception as exc:  # surfaced to the panel's toast
                self.failed.emit(exc)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        """Request cancellation of the in-flight run."""
        self._cancel.set()

    def wait(self, timeout: float | None = None):
        if self._thread is not None:
            self._thread.join(timeout)
        return self._result

    # ------------------------------------------------------------------
    def info(self):
        """Operand/variable/merit tables (reference `problem.info`)."""
        return self.build_problem().info()

    def to_dict(self) -> dict:
        """Serialize the problem definition (panel save/load)."""
        return {"operands": [r.to_dict() for r in self.operands],
                "variables": [r.to_dict() for r in self.variables]}

    def from_dict(self, data: dict) -> None:
        self.clear()
        for r in data.get("operands", []):
            self.operands.append(OperandRow(
                r["operand_type"], r.get("target"), r.get("weight", 1.0),
                r.get("min_val"), r.get("max_val"),
                dict(r.get("input_data", {}))))
        for r in data.get("variables", []):
            self.variables.append(VariableRow(r["variable_type"],
                                              dict(r.get("kwargs", {}))))
