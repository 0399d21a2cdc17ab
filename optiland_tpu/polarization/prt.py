"""Polarization ray tracing (PRT): 3x3 per-ray polarization matrices.

Functional counterpart of the reference's `PolarizedRays`
(`rays/polarized_rays.py:17-233`): each ray carries a complex 3x3 matrix `p`
composed at every surface as p <- (O_out J O_in) p, where O_in/O_out rotate
between global coordinates and the local (s, p, k) basis before/after the
interaction. All operations are batched (N, 3, 3) einsums — MXU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu import config


def identity_prt(n: int, dtype=None):
    dtype = dtype or config.complex_dtype()
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))


def local_basis(k0, k1):
    """s/p basis vectors and rotation matrices for an interaction.

    Args:
        k0: (N, 3) incident directions. k1: (N, 3) outgoing directions.
    Returns:
        (s, p0, p1, o_in, o_out): o_in = rows (s, p0, k0) — projects global
        vectors into the incident local frame; o_out = columns (s, p1, k1) —
        maps local exit components back to global
        (reference `polarized_rays.py:136-178`).
    """
    s = jnp.cross(k0, k1)
    mag = jnp.linalg.norm(s, axis=-1, keepdims=True)

    # Fallback for k0 ~ k1 (normal incidence / index-matched interfaces):
    # build any transverse vector. The reference tests `mag == 0` exactly
    # (`polarized_rays.py:155`), which numpy satisfies for identical k0/k1 —
    # but XLA fuses the cross product's multiply-subtract into FMAs, so
    # cross(k, k) returns O(eps) NOISE, not zero. Normalizing that noise
    # yields an s that is not perpendicular to k, which silently produces a
    # NON-orthogonal polarization rotation (observed: |p| entries of 1.2 on
    # a fold-mirror chain). A dtype-scaled tolerance restores the fallback.
    eps = 100.0 * jnp.finfo(k0.dtype).eps
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], k0.dtype), k0.shape)
    y = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], k0.dtype), k0.shape)
    p_fb = jnp.cross(k0, x)
    p_fb_norm = jnp.linalg.norm(p_fb, axis=-1, keepdims=True)
    p_fb = jnp.where(p_fb_norm < eps, jnp.cross(k0, y), p_fb)
    s_fb = jnp.cross(p_fb, k0)

    s = jnp.where(mag < eps, s_fb, s)
    s = s / jnp.linalg.norm(s, axis=-1, keepdims=True)

    p0 = jnp.cross(k0, s)
    p1 = jnp.cross(k1, s)

    o_in = jnp.stack((s, p0, k0), axis=1)  # rows
    o_out = jnp.stack((s, p1, k1), axis=2)  # columns
    return s, p0, p1, o_in, o_out


def surface_prt(k0, k1, jones_matrix=None):
    """Per-surface polarization matrix O_out [J] O_in
    (reference `polarized_rays.py:180-205`)."""
    _, _, _, o_in, o_out = local_basis(k0, k1)
    if jones_matrix is None:
        return jnp.einsum("nij,njk->nik", o_out, o_in)
    o_outc = o_out.astype(jones_matrix.dtype)
    o_inc = o_in.astype(jones_matrix.dtype)
    return jnp.einsum("nij,njk,nkl->nil", o_outc, jones_matrix, o_inc)


def initial_field(k, state):
    """3-D E field for the starting rays (reference
    `polarized_rays.py:207-233`): s = (k x x)/|..| x k ... built from the
    x-axis transverse direction."""
    x = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], k.dtype), k.shape)
    p = jnp.cross(k, x)
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    s = jnp.cross(p, k)
    pdt = config.phase_dtype()
    iu = config.imag_unit()
    E = (state.Ex * jnp.exp(iu * jnp.asarray(state.phase_x, pdt)) * s
         + state.Ey * jnp.exp(iu * jnp.asarray(state.phase_y, pdt)) * p)
    return E


def exit_fields(p_matrix, k0, i0, state):
    """Scaled exit field list (reference `get_exit_fields`)."""
    from optiland_tpu.polarization.state import PolarizationState

    if state is not None and state.is_polarized:
        states = [state]
    else:
        states = [PolarizationState(True, 1.0, 0.0, 0.0, 0.0),
                  PolarizationState(True, 0.0, 1.0, 0.0, 0.0)]
    fields = []
    for st in states:
        E0 = initial_field(k0, st)
        E1 = jnp.einsum("nij,nj->ni", p_matrix, E0.astype(p_matrix.dtype))
        fields.append(E1)
    scale = jnp.sqrt(i0 / len(fields))[..., None]
    return [E * scale for E in fields]


def intensity_from_prt(p_matrix, k0, i0, state):
    """Final intensity from the PRT matrix (reference `update_intensity`,
    `polarized_rays.py:122-134`)."""
    from optiland_tpu.polarization.state import PolarizationState

    if state is not None and state.is_polarized:
        states = [state]
    else:
        states = [PolarizationState(True, 1.0, 0.0, 0.0, 0.0),
                  PolarizationState(True, 0.0, 1.0, 0.0, 0.0)]
    total = 0.0
    for st in states:
        E0 = initial_field(k0, st)
        E1 = jnp.einsum("nij,nj->ni", p_matrix, E0.astype(p_matrix.dtype))
        total = total + jnp.sum(jnp.abs(E1) ** 2, axis=-1)
    return total * i0 / len(states)
