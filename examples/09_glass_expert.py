"""Glass Expert (reference Tutorial_7e): categorical glass-catalog search
— a greedy (n_d, V_d) neighbor walk over the 3201-glass catalog interleaved
with continuous radius refinement."""

import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.optimization import GlassExpert, OptimizationProblem


def main(maxiter: int = 15):
    lens = CookeTriplet()
    p = OptimizationProblem(lens)
    p.add_operand(operand_type="f2", target=50, weight=1)
    p.add_operand(operand_type="rms_spot_size", target=0, weight=10,
                  input_data={"surface_number": -1, "Hx": 0, "Hy": 0.0,
                              "num_rays": 5, "wavelength": 0.55})
    for s in (1, 2, 3, 5, 6):
        p.add_variable(lens, "radius", surface_number=s)

    before = float(np.asarray(p.sum_squared()))
    ge = GlassExpert(p, glass_surfaces=[3],
                     glass_selection=["F2", "N-SF5", "SF11", "N-BK7",
                                      "LAK9", "SF2"],
                     pool_size=4, verbose=False)
    ge.optimize(maxiter=maxiter, disp=False)
    after = float(np.asarray(p.sum_squared()))
    print(f"merit {before:.5e} -> {after:.5e}")
    return after


if __name__ == "__main__":
    main()
