"""Coordinate transforms between the global frame and per-surface local frames.

Functional replacement for the reference's `CoordinateSystem.localize/globalize`
(`optiland/coordinate_system.py:73-107`), which mutates rays via chained
rotate/translate calls. Here a surface frame is a `(translation, euler_xyz)`
pair of arrays and the transform is applied as pure functions on a ray bundle.

Convention (matching the reference): localize = translate(-t) then rotate by
-rz, -ry, -rx (in that order); globalize = rotate rx, ry, rz then translate(+t).
Rotations use the right-handed rotation matrices about each axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optiland_tpu.core.rays import Rays


def _rot_x(x, y, z, c, s):
    return x, y * c - z * s, y * s + z * c


def _rot_y(x, y, z, c, s):
    return x * c + z * s, y, -x * s + z * c


def _rot_z(x, y, z, c, s):
    return x * c - y * s, x * s + y * c, z


def localize(rays: Rays, tx, ty, tz, rx, ry, rz) -> Rays:
    """Transform rays from the global frame into the surface-local frame."""
    x, y, z = rays.x - tx, rays.y - ty, rays.z - tz
    L, M, N = rays.L, rays.M, rays.N
    # rotate by -rz, -ry, -rx
    for rot, ang in ((_rot_z, rz), (_rot_y, ry), (_rot_x, rx)):
        c, s = jnp.cos(-ang), jnp.sin(-ang)
        x, y, z = rot(x, y, z, c, s)
        L, M, N = rot(L, M, N, c, s)
    return rays.replace(x=x, y=y, z=z, L=L, M=M, N=N)


def globalize(rays: Rays, tx, ty, tz, rx, ry, rz) -> Rays:
    """Transform rays from the surface-local frame back to the global frame."""
    x, y, z = rays.x, rays.y, rays.z
    L, M, N = rays.L, rays.M, rays.N
    for rot, ang in ((_rot_x, rx), (_rot_y, ry), (_rot_z, rz)):
        c, s = jnp.cos(ang), jnp.sin(ang)
        x, y, z = rot(x, y, z, c, s)
        L, M, N = rot(L, M, N, c, s)
    return rays.replace(x=x + tx, y=y + ty, z=z + tz, L=L, M=M, N=N)


def translate_z(rays: Rays, tz) -> Rays:
    """Fast path for untilted, on-axis surfaces: a pure z shift."""
    return rays.replace(z=rays.z - tz)


def untranslate_z(rays: Rays, tz) -> Rays:
    return rays.replace(z=rays.z + tz)


def rotation_matrix(rx, ry, rz) -> jax.Array:
    """3x3 rotation matrix R = Rz @ Ry @ Rx (reference
    `coordinate_system.py:121-143`)."""
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx
