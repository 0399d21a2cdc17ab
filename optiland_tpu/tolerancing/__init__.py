from optiland_tpu.tolerancing.core import (
    Tolerancing,
    ScalarSampler,
    RangeSampler,
    NormalSampler,
    UniformSampler,
)
from optiland_tpu.tolerancing.monte_carlo import MonteCarlo
from optiland_tpu.tolerancing.sensitivity import SensitivityAnalysis

__all__ = [
    "Tolerancing",
    "ScalarSampler",
    "RangeSampler",
    "NormalSampler",
    "UniformSampler",
    "MonteCarlo",
    "SensitivityAnalysis",
]
