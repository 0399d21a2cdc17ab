"""Transfer-matrix method (TMM) for coherent thin-film stacks.

Re-implementation of the reference's Abeles-matrix TMM
(`thin_film/core.py:23-160`; Macleod Ch. 2, Chipman Ch. 13) as a pure
jittable function over (wavelength, AOI) grids. Layer data arrives as padded
arrays (n, k, thickness per layer), so the layer loop unrolls at trace time
and the whole R/T/A spectrum evaluation is one fused XLA graph —
differentiable w.r.t. layer thicknesses and indices (the inputs the
reference's needle-synthesis optimizer varies).
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu import config

# sqrt(eps0/mu0) in siemens, as the reference (`thin_film/core.py:69`)
_SQRT_EPS_MU = 0.002654418729832701370374020517935


def _snell_cos(n0, theta0, n):
    """Forward-branch cosine of the propagation angle in medium n
    (reference `_snell_cos`, Macleod 2.6)."""
    nr = jnp.real(n)
    k = jnp.imag(n)
    return jnp.sqrt(
        (nr**2 - k**2 - (n0 * jnp.sin(theta0)) ** 2
         - 2 * config.imag_unit() * nr * k)
        .astype(config.complex_dtype())
    ) / n


def _admittance(n, cos_t, pol: str):
    eta_s = _SQRT_EPS_MU * n * cos_t
    if pol == "s":
        return eta_s
    if pol == "p":
        return (_SQRT_EPS_MU**2
                * (jnp.real(n) - config.imag_unit() * jnp.imag(n)) ** 2
                / eta_s)
    raise ValueError("pol must be 's' or 'p'")


def tmm_coh(n0, ns, layer_n, layer_d_um, wavelength_um, theta0_rad, pol: str):
    """Coherent TMM for one polarization.

    Args:
        n0, ns: complex incident/substrate indices (broadcastable over the
            wavelength/AOI grid).
        layer_n: list/sequence of complex layer indices (each broadcastable).
        layer_d_um: list of layer physical thicknesses in um.
        wavelength_um, theta0_rad: evaluation grids (broadcastable).
        pol: 's' or 'p'.

    Returns:
        (r, t, R, T, A) matching the reference's `_tmm_coh`.
    """
    cdt = config.complex_dtype()  # c64 on TPU (no C128 support)
    n0 = jnp.asarray(n0, cdt)
    ns = jnp.asarray(ns, cdt)
    w = jnp.asarray(wavelength_um)
    th = jnp.asarray(theta0_rad)

    cos0 = _snell_cos(n0, th, n0)
    coss = _snell_cos(n0, th, ns)
    eta0 = _admittance(n0, cos0, pol)
    etas = _admittance(ns, coss, pol)

    A = jnp.ones_like(eta0)
    B = jnp.zeros_like(eta0)
    C = jnp.zeros_like(eta0)
    D = jnp.ones_like(eta0)

    for n_l, d_l in zip(layer_n, layer_d_um):
        n_l = jnp.asarray(n_l, cdt)
        cos_l = _snell_cos(n0, th, n_l)
        eta_l = _admittance(n_l, cos_l, pol)
        delta = 2.0 * jnp.pi / w * n_l * d_l * cos_l
        c = jnp.cos(delta)
        s = jnp.sin(delta)
        iu = config.imag_unit()
        mB = iu * (s / eta_l)
        mC = iu * (eta_l * s)
        A, B, C, D = (A * c + B * mC, A * mB + B * c,
                      C * c + D * mC, C * mB + D * c)

    denom = eta0 * (A + etas * B) + C + etas * D
    denom = jnp.where(jnp.abs(denom) == 0, 1e-30 + 0j, denom)

    r = (eta0 * A + eta0 * etas * B - C - etas * D) / denom
    t = jnp.conj((2.0 * eta0) / denom)

    R = jnp.real(r * jnp.conj(r))
    T = jnp.real(t * jnp.conj(t)) * jnp.real(etas) / jnp.real(eta0)
    return r, t, R, T, 1.0 - R - T
