"""optiland_tpu — a TPU-native differentiable sequential ray tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of optiland
(HarrisonKramer/optiland): lens modeling, real + paraxial ray tracing,
wavefront / PSF / MTF analysis, optimization, and tolerancing — built
around a functional core (pytrees + jit + vmap + shard_map) instead of
optiland's mutable OO + dual numpy/torch backend.

Architecture (vs. reference layer map, SURVEY.md §1):
  - reference L1 "backend"        -> JAX itself + `optiland_tpu.config` dtype policy
  - reference L2-L4 physics/surfs -> pure functions over `SurfaceStack` pytrees
  - reference L5 Optic facade     -> `optiland_tpu.Optic` (thin OO shell that
                                      compiles to a (static, params) pair)
  - reference L6 analysis/opt     -> jitted functions consuming the trace history
  - parallelism                   -> ray-batch sharding over a jax Mesh
"""

from __future__ import annotations

import jax as _jax

# f64 must be available for parity with the reference's numpy (float64) backend.
# TPU perf paths explicitly use f32/bf16; enabling x64 does not force f64 compute.
_jax.config.update("jax_enable_x64", True)

from optiland_tpu import config  # noqa: E402
from optiland_tpu.config import set_precision, get_dtype  # noqa: E402
from optiland_tpu.core.rays import Rays  # noqa: E402
from optiland_tpu.system.optic import Optic  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Optic",
    "Rays",
    "config",
    "set_precision",
    "get_dtype",
]
