"""Design optimization (reference Tutorial_5a/5b): build a merit function
from operands + variables, then optimize with scipy (host-side driver over
the jitted value_and_grad) and with optax Adam (fully on-device loop)."""

import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.optimization import (
    AdamOptimizer,
    OptimizationProblem,
    OptimizerGeneric,
)


def build_problem(lens):
    p = OptimizationProblem(lens)
    p.add_operand(operand_type="f2", target=50, weight=1)
    p.add_operand(operand_type="rms_spot_size", target=0, weight=10,
                  input_data={"surface_number": -1, "Hx": 0, "Hy": 0.0,
                              "num_rays": 5, "wavelength": 0.55})
    for s in (1, 2, 3, 5, 6):
        p.add_variable(lens, "radius", surface_number=s)
    p.add_variable(lens, "thickness", surface_number=4)
    return p


def main():
    lens = CookeTriplet()
    p = build_problem(lens)
    m0 = float(p.sum_squared())
    print(f"initial merit = {m0:.6e}")
    print(p.info())

    result = OptimizerGeneric(p).optimize(maxiter=30, disp=False)
    m1 = float(p.sum_squared())
    print(f"after scipy minimize: merit = {m1:.6e} "
          f"({result.nit} iterations)")

    # Adam: the entire step (trace + grad + update) is one jitted graph.
    # Detune the (near-optimal) prescription first so there is room to move.
    lens2 = CookeTriplet()
    params = lens2.params
    lens2.update_params(params.replace(cv=params.cv * 1.05))
    p2 = build_problem(lens2)
    m2_start = float(p2.sum_squared())
    res = AdamOptimizer(p2, lr=1e-3).optimize(n_steps=100)
    m2 = float(res.loss_history[-1])
    print(f"Adam on the detuned lens: merit {m2_start:.6e} -> {m2:.6e}")
    assert m1 < m0 and m2 < m2_start
    return m1, m2


if __name__ == "__main__":
    main()
