"""Fused merit functions for the optimization hot path.

The centroid-RMS spot merit (the production objective in `bench.py` and the
natural Adam target for spot optimization) consumes only four weighted
moments of the image-surface state. `optiland_tpu.trace.fused.spot_moments`
computes them in ONE kernel launch (raygen + trace + in-kernel reduction on
TPU), so neither the forward nor the backward ever materializes a per-ray
array in HBM. Reference analogue: `rms_spot_size` operand composition,
`/root/reference/optiland/optimization/operand/ray.py:300-340`."""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.trace.fused import spot_moments


def centroid_rms_spot(static, params, Hx, Hy, Px, Py, wavelength,
                      eps: float = 1e-6, interpret: bool = False,
                      diff_inputs: bool = True):
    """Intensity-weighted RMS spot size (squared) about the weighted
    centroid at the image surface:

        loss = sum(((x-cx)^2 + (y-cy)^2) * i) / (sum(i) + eps)

    Differentiable w.r.t. `params` (and, by default, the field/pupil/
    wavelength inputs); single fused kernel launch on TPU for the
    supported system class. `diff_inputs=False` EXPLICITLY declares the
    per-ray input cotangents unwanted, letting the backward kernel skip
    their adjoint math and HBM writes — the params-only optimization
    loop's fast path (their gradients then come back as zeros)."""
    m0, m1, m2, m3 = spot_moments(static, params, Hx, Hy, Px, Py,
                                  wavelength, interpret=interpret,
                                  diff_data=diff_inputs)
    ws = m0 + eps
    cx = m1 / ws
    cy = m2 / ws
    # expansion of sum(((x-cx)^2+(y-cy)^2) i) in moments
    return (m3 - 2.0 * (cx * m1 + cy * m2) + (cx * cx + cy * cy) * m0) / ws
