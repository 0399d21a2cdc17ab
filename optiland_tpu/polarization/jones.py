"""Jones matrix library: batched (N, 3, 3) complex matrices.

Functional re-implementation of the reference's `optiland/jones.py:25-411`.
Each function takes pre/post ray directions (k0, k1 as (N, 3)) plus
element-specific parameters, returning the padded 3x3 Jones matrix in the
local (s, p, k) frame. Built with stacked jnp ops (no in-place assembly), so
everything jits and differentiates.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu import config
from optiland_tpu.polarization.prt import local_basis


def _assemble(j00, j01, j10, j11, j22, n, dtype=None):
    # policy complex dtype: c64 on TPU (no C128 support), c128 in f64
    # parity; Python complex scalars are converted HOST-side (a raw
    # `1j*...` operand would ship a c128 scalar to the device — TPU trap)
    dtype = dtype or config.complex_dtype()
    z = jnp.zeros(n, dtype)

    def c(v):
        return (jnp.asarray(complex(v), dtype) if isinstance(v, (int, float,
                complex)) else v) + z

    rows = [
        jnp.stack([c(j00), c(j01), z], axis=-1),
        jnp.stack([c(j10), c(j11), z], axis=-1),
        jnp.stack([z, z, c(j22)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def fresnel(k0, k1, aoi, n1, n2, reflect: bool):
    """Fresnel amplitude coefficients as a Jones matrix
    (reference `JonesFresnel.calculate_matrix`, `jones.py:57-117`)."""
    cos_i = jnp.cos(aoi)
    n = n2 / n1
    root = jnp.sqrt((n**2 - jnp.sin(aoi) ** 2)
                    .astype(config.complex_dtype()))
    if reflect:
        s = (cos_i - root) / (cos_i + root)
        p = (n**2 * cos_i - root) / (n**2 * cos_i + root)
        return _assemble(s, 0.0, 0.0, -p, -1.0, k0.shape[0])
    s = 2 * cos_i / (cos_i + root)
    p = 2 * n * cos_i / (n**2 * cos_i + root)
    return _assemble(s, 0.0, 0.0, p, 1.0, k0.shape[0])


def _axis_in_basis(k0, k1, axis):
    """Unit projection of a global axis onto the incident (s, p0) plane."""
    s, p0, p1, _, _ = local_basis(k0, k1)
    axis_b = jnp.broadcast_to(jnp.asarray(axis, k0.dtype), k0.shape)
    ts = jnp.sum(axis_b * s, axis=-1)
    tp = jnp.sum(axis_b * p0, axis=-1)
    norm = jnp.sqrt(ts**2 + tp**2)
    norm = jnp.where(norm == 0, 1.0, norm)
    return ts / norm, tp / norm, s, p0, p1


def linear_polarizer(k0, k1, axis):
    """General linear polarizer with a global transmission axis
    (reference `JonesLinearPolarizer`, `jones.py:120-185`)."""
    us_in, up_in, s, p0, p1 = _axis_in_basis(k0, k1, axis)
    axis_b = jnp.broadcast_to(jnp.asarray(axis, k0.dtype), k0.shape)
    ts_out = jnp.sum(axis_b * s, axis=-1)
    tp_out = jnp.sum(axis_b * p1, axis=-1)
    norm = jnp.sqrt(ts_out**2 + tp_out**2)
    norm = jnp.where(norm == 0, 1.0, norm)
    us_out, up_out = ts_out / norm, tp_out / norm
    return _assemble(us_out * us_in, us_out * up_in, up_out * us_in,
                     up_out * up_in, 1.0, k0.shape[0])


def polarizer_h(k0, k1):
    return linear_polarizer(k0, k1, [1.0, 0.0, 0.0])


def polarizer_v(k0, k1):
    return linear_polarizer(k0, k1, [0.0, 1.0, 0.0])


def _constant(j00, j01, j10, j11, n):
    return _assemble(j00, j01, j10, j11, 1.0, n)


def polarizer_rcp(k0, k1):
    """Right circular polarizer (reference `JonesPolarizerRCP`)."""
    return _constant(0.5, 1j * 0.5, -1j * 0.5, 0.5, k0.shape[0])


def polarizer_lcp(k0, k1):
    return _constant(0.5, -1j * 0.5, 1j * 0.5, 0.5, k0.shape[0])


def linear_diattenuator(k0, k1, t_min, t_max, axis=(1.0, 0.0, 0.0)):
    """(reference `JonesLinearDiattenuator`)."""
    us, up, *_ = _axis_in_basis(k0, k1, axis)
    j00 = t_max * us**2 + t_min * up**2
    j0x = (t_max - t_min) * us * up
    j11 = t_max * up**2 + t_min * us**2
    return _assemble(j00, j0x, j0x, j11, 1.0, k0.shape[0])


def linear_retarder(k0, k1, retardance, axis=(1.0, 0.0, 0.0)):
    """(reference `JonesLinearRetarder`)."""
    d = retardance
    us, up, *_ = _axis_in_basis(k0, k1, axis)
    d = jnp.asarray(d, config.phase_dtype())
    iu = config.imag_unit()
    j00 = jnp.exp(-iu * d / 2) * us**2 + jnp.exp(iu * d / 2) * up**2
    j0x = -2 * iu * jnp.sin(d / 2) * us * up
    j11 = jnp.exp(iu * d / 2) * us**2 + jnp.exp(-iu * d / 2) * up**2
    return _assemble(j00, j0x, j0x, j11, 1.0, k0.shape[0])


def quarter_wave_retarder(k0, k1, theta=0.0):
    axis = [jnp.cos(theta), jnp.sin(theta), 0.0]
    return linear_retarder(k0, k1, jnp.pi / 2, axis)


def half_wave_retarder(k0, k1, theta=0.0):
    axis = [jnp.cos(theta), jnp.sin(theta), 0.0]
    return linear_retarder(k0, k1, jnp.pi, axis)
