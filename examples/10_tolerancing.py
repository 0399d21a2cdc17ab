"""Tolerancing (reference Tutorial_8a/8b): sensitivity analysis plus a
vmapped Monte Carlo — every perturbation draw traces as one extra batch
axis of a single jitted graph, so thousands of draws run at ray-trace
speed (and shard over a TPU mesh; see 14_tpu_sharded_trace.py)."""

import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.tolerancing import (
    MonteCarlo,
    NormalSampler,
    SensitivityAnalysis,
    Tolerancing,
)


def main(draws: int = 256):
    lens = CookeTriplet()
    t = Tolerancing(lens)
    t.add_perturbation("radius", NormalSampler(22.01359, 0.05),
                       surface_number=1)
    t.add_perturbation("thickness", NormalSampler(4.75041, 0.02),
                       surface_number=4)
    t.add_operand("f2")
    t.add_operand("rms_spot_size", input_data={
        "surface_number": -1, "Hx": 0, "Hy": 0.0, "num_rays": 5,
        "wavelength": 0.55})

    sens = SensitivityAnalysis(t)
    table = sens.run()
    print("sensitivity table:")
    print(table)

    mc = MonteCarlo(t)
    df = mc.run(draws, seed=0)
    f2_col = [c for c in df.columns if "f2" in c][0]
    f2 = df[f2_col].to_numpy()
    print(f"{draws} Monte-Carlo draws: f2 = {f2.mean():.4f} "
          f"+/- {f2.std():.4f} mm")
    return df


if __name__ == "__main__":
    main()
