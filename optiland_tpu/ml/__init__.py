"""Hybrid physics-ML integration layer.

Counterpart of the reference's `optiland/ml/` package (`ml/wrappers.py:32`
`OpticalSystemModule(nn.Module)`): expose an optical system's optimization
variables as trainable leaves of a differentiable module so the lens can sit
inside a larger learned pipeline. Here the module is JAX-native: a pure
`loss(x, ...)` function plus optax training utilities, with an optional flax
`nn.Module` adapter for flax ecosystems.
"""

from optiland_tpu.ml.wrappers import OpticalSystemModule

__all__ = ["OpticalSystemModule"]
