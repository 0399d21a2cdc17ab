"""Ray generation: field/pupil coordinates -> starting ray bundle.

Covers the reference's RayGenerator + paraxial ray aimer + field-type origin
logic (`optiland/rays/ray_generator.py:47-99`,
`rays/ray_aiming/paraxial.py:33-118`, `fields/field_types/{angle,
object_height}.py`) as pure functions of `(static, params)`. Everything here
runs inside jit, so the paraxial EPL/EPD sub-traces fuse into the same XLA
graph as the real trace — and are differentiated through, which is what
makes merit gradients exact w.r.t. thicknesses/curvatures even though ray
aiming depends on them.

Vignetting: the reference interpolates per-field vignetting factors with a
nearest-neighbor lookup (`fields/field_group.py:93-122`); replicated here
over the (small, static) field table.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.core.rays import Rays, make_rays
from optiland_tpu.system import paraxial as px
from optiland_tpu.system.spec import SystemParams, SystemStatic


def vignetting_factors(static: SystemStatic, params: SystemParams, Hx, Hy):
    """Nearest-neighbor interpolation of (vx, vy) over the field table."""
    max_field = jnp.max(jnp.sqrt(params.x_fields**2 + params.y_fields**2))
    scale = jnp.where(max_field == 0, 1.0, max_field)
    fx = params.x_fields / scale
    fy = params.y_fields / scale
    # distance from each query to each defined field: (N, F)
    d2 = (Hx[..., None] - fx) ** 2 + (Hy[..., None] - fy) ** 2
    idx = jnp.argmin(d2, axis=-1)
    # one-hot contraction instead of a gather: the gather's backward is a
    # 2M-element scatter-add into (F,), which costs ~35 ms/step on TPU and
    # dominated the whole bench pipeline; the one-hot matvec backward is a
    # pair of F-length reductions
    onehot = (idx[:, None] == jnp.arange(params.vx.shape[0])).astype(
        params.vx.dtype)
    return onehot @ params.vx, onehot @ params.vy


def _ray_origins(static: SystemStatic, params: SystemParams, Hx, Hy, Px, Py,
                 vx, vy, epl, epd):
    """Starting positions by field type (reference field_types/*.py)."""
    from optiland_tpu.system.spec import positions_of
    pos = positions_of(static, params)
    max_field = jnp.max(jnp.sqrt(params.x_fields**2 + params.y_fields**2))
    field_x = max_field * Hx
    field_y = max_field * Hy

    if static.field_type == "angle":
        if static.object_infinite:
            # start one-EPD upstream of the first surface
            offset = epd - jnp.min(pos[1:-1])
            x = -jnp.tan(jnp.deg2rad(field_x)) * (offset + epl)
            y = -jnp.tan(jnp.deg2rad(field_y)) * (offset + epl)
            z = pos[1] - offset
            x0 = Px * epd / 2.0 * vx + x
            y0 = Py * epd / 2.0 * vy + y
            z0 = jnp.broadcast_to(z, Px.shape)
        else:
            z0 = jnp.broadcast_to(pos[0], Px.shape)
            x0 = jnp.broadcast_to(
                -jnp.tan(jnp.deg2rad(field_x)) * (epl - pos[0]), Px.shape
            )
            y0 = jnp.broadcast_to(
                -jnp.tan(jnp.deg2rad(field_y)) * (epl - pos[0]), Px.shape
            )
        return x0, y0, z0

    if static.field_type == "object_height":
        if static.object_infinite:
            raise ValueError(
                "field type 'object_height' is invalid for an infinite object"
            )
        x0 = jnp.broadcast_to(field_x, Px.shape)
        y0 = jnp.broadcast_to(field_y, Px.shape)
        z0 = jnp.broadcast_to(pos[0], Px.shape)
        return x0, y0, z0

    raise ValueError(f"Unsupported field type {static.field_type!r}")


def generate_rays(static: SystemStatic, params: SystemParams, Hx, Hy, Px, Py,
                  wavelength, apply_vignetting: bool = True,
                  polarized: bool = False) -> Rays:
    """Aim rays at the paraxial entrance pupil and build the starting bundle.

    Hx/Hy/Px/Py are same-length 1-D arrays of normalized field and pupil
    coordinates; `wavelength` is scalar or per-ray.
    """
    Hx = jnp.atleast_1d(jnp.asarray(Hx, params.cv.dtype))
    Hy = jnp.atleast_1d(jnp.asarray(Hy, params.cv.dtype))
    Px = jnp.atleast_1d(jnp.asarray(Px, params.cv.dtype))
    Py = jnp.atleast_1d(jnp.asarray(Py, params.cv.dtype))
    Hx, Hy, Px, Py = jnp.broadcast_arrays(Hx, Hy, Px, Py)

    if apply_vignetting:
        vxf, vyf = vignetting_factors(static, params, Hx, Hy)
        vx, vy = 1.0 - vxf, 1.0 - vyf
    else:
        vx = vy = jnp.ones_like(Px)

    epl = px.EPL(static, params)
    epd = px.EPD(static, params)

    x0, y0, z0 = _ray_origins(static, params, Hx, Hy, Px, Py, vx, vy, epl, epd)

    # aim at the paraxial entrance pupil
    x1 = Px * epd * vx / 2.0
    y1 = Py * epd * vy / 2.0
    z1 = jnp.broadcast_to(epl, Px.shape)

    dx, dy, dz = x1 - x0, y1 - y0, z1 - z0
    mag = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    degenerate = mag < 1e-9
    mag = jnp.where(degenerate, 1.0, mag)
    L = jnp.where(degenerate, 0.0, dx / mag)
    M = jnp.where(degenerate, 0.0, dy / mag)
    N = jnp.where(degenerate, 1.0, dz / mag)

    if static.apodization is not None:
        intensity = static.apodization.get_intensity(Px, Py)
    else:
        intensity = jnp.ones_like(Px)
    rays = make_rays(x0, y0, z0, L, M, N, intensity=intensity,
                     wavelength=wavelength, dtype=params.cv.dtype)
    if polarized:
        from optiland_tpu.polarization.prt import identity_prt

        rays = rays.replace(p=identity_prt(rays.x.shape[0]))
    return rays
