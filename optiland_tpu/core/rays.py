"""Ray bundles and the ray-level physics primitives.

Functional counterpart of the reference's mutable `RealRays`
(`optiland/rays/real_rays.py:23`): a `Rays` pytree of SoA arrays plus pure
functions (`propagate`, `refract`, `reflect`, ...) that return new bundles.
This is what makes the tracer jit/vmap/grad/shard-transparent: a ray batch is
just a pytree with a leading `(num_rays,)` axis that can be sharded over a
device mesh.

Conventions (kept identical to the reference for output parity):
  - direction cosines (L, M, N) are normalized,
  - `clip` zeroes intensity but keeps tracing (reference `real_rays.py:154`),
  - the surface normal is sign-aligned with the incident direction before
    refraction/reflection (reference `real_rays.py:535-571`),
  - total internal reflection is masked (intensity -> 0) instead of letting
    NaNs flow, so gradients stay clean under `jax.grad`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Rays:
    """A batch of real rays as a pytree of same-shape arrays.

    Attributes:
        x, y, z: positions.
        L, M, N: direction cosines (normalized).
        i: intensity (0 marks clipped/TIR rays; they keep tracing).
        opd: accumulated optical path length.
        w: wavelength in micrometers (per ray — one batch may mix wavelengths).
    """

    x: jax.Array
    y: jax.Array
    z: jax.Array
    L: jax.Array
    M: jax.Array
    N: jax.Array
    i: jax.Array
    opd: jax.Array
    w: jax.Array
    # polarization ray-tracing matrix (N, 3, 3) complex; None = unpolarized
    # trace (reference PolarizedRays.p, `rays/polarized_rays.py:51`)
    p: jax.Array | None = None

    @property
    def num_rays(self) -> int:
        return self.x.shape[-1]

    def replace(self, **kw) -> "Rays":
        return dataclasses.replace(self, **kw)


def make_rays(x, y, z, L, M, N, intensity=None, wavelength=None, dtype=None) -> Rays:
    """Build a ray bundle, broadcasting scalars to a common shape."""
    arrs = [jnp.asarray(a, dtype=dtype) for a in (x, y, z, L, M, N)]
    shape = jnp.broadcast_shapes(*(a.shape for a in arrs))
    x, y, z, L, M, N = (jnp.broadcast_to(a, shape) for a in arrs)
    i = (
        jnp.ones(shape, x.dtype)
        if intensity is None
        else jnp.broadcast_to(jnp.asarray(intensity, x.dtype), shape)
    )
    w = (
        jnp.full(shape, 0.55, x.dtype)
        if wavelength is None
        else jnp.broadcast_to(jnp.asarray(wavelength, x.dtype), shape)
    )
    return Rays(x, y, z, L, M, N, i, jnp.zeros(shape, x.dtype), w)


def propagate(rays: Rays, t: jax.Array) -> Rays:
    """Advance rays by distance t along their direction (homogeneous medium)."""
    return rays.replace(
        x=rays.x + t * rays.L,
        y=rays.y + t * rays.M,
        z=rays.z + t * rays.N,
    )


def normalize(rays: Rays) -> Rays:
    mag = jnp.sqrt(rays.L**2 + rays.M**2 + rays.N**2)
    return rays.replace(L=rays.L / mag, M=rays.M / mag, N=rays.N / mag)


def clip(rays: Rays, outside) -> Rays:
    """Zero the intensity where `outside` is True; rays keep tracing."""
    return rays.replace(i=jnp.where(outside, jnp.zeros_like(rays.i), rays.i))


def _align_normal(rays: Rays, nx, ny, nz):
    """Flip the normal to point along the incident direction.

    Returns (nx, ny, nz, |cos(aoi)|) — the convention the reference applies
    before its vector refraction/reflection equations (`real_rays.py:535`).
    """
    dot = rays.L * nx + rays.M * ny + rays.N * nz
    sgn = jnp.sign(dot)
    return nx * sgn, ny * sgn, nz * sgn, jnp.abs(dot)


def refract(rays: Rays, nx, ny, nz, n1, n2) -> Rays:
    """Vector Snell refraction at a surface with normal (nx, ny, nz).

    n1/n2 are the refractive indices before/after the surface (arrays
    broadcastable against the ray batch, since indices depend on the per-ray
    wavelength). Rays undergoing total internal reflection are clipped
    (intensity 0) and given an unchanged direction, keeping the computation
    NaN-free — the reference lets NaN flow instead (`real_rays.py:179`),
    which poisons gradients under JAX.
    """
    u = n1 / n2
    nx, ny, nz, cosi = _align_normal(rays, nx, ny, nz)
    disc = 1.0 - u**2 * (1.0 - cosi**2)
    tir = disc < 0.0
    root = jnp.sqrt(jnp.where(tir, 0.0, disc))
    tx = u * rays.L + nx * (root - u * cosi)
    ty = u * rays.M + ny * (root - u * cosi)
    tz = u * rays.N + nz * (root - u * cosi)
    return rays.replace(
        L=jnp.where(tir, rays.L, tx),
        M=jnp.where(tir, rays.M, ty),
        N=jnp.where(tir, rays.N, tz),
        i=jnp.where(tir, jnp.zeros_like(rays.i), rays.i),
    )


def grating_diffract(rays: Rays, nx, ny, nz, fx, fy, fz, m, d, n1, n2,
                     is_reflective: bool) -> Rays:
    """Vector grating diffraction.

    Compact tangential-momentum form of the reference's expanded closed form
    (`rays/real_rays.py:207-522`, verified algebraically identical):

        out = (n1 d u0_t + m w f_t - n sqrt(Q)) / (d n2')

    with u0_t the tangential incident direction, f the (unit) grating vector,
    w the per-ray wavelength (um), d the local grating period (um),
    n2' = -n2 for reflection, and Q = d^2 n2^2 - |n1 d u0_t + m w f_t|^2.
    Evanescent orders (Q < 0) are masked to intensity 0 (the reference lets
    NaN flow).
    """
    nx, ny, nz, cosi = _align_normal(rays, nx, ny, nz)
    # tangential components of the incident direction and grating vector
    u_t = (rays.L - cosi * nx, rays.M - cosi * ny, rays.N - cosi * nz)
    fdotn = fx * nx + fy * ny + fz * nz
    f_t = (fx - fdotn * nx, fy - fdotn * ny, fz - fdotn * nz)

    n2c = -n2 if is_reflective else n2
    Tx = n1 * d * u_t[0] + m * rays.w * f_t[0]
    Ty = n1 * d * u_t[1] + m * rays.w * f_t[1]
    Tz = n1 * d * u_t[2] + m * rays.w * f_t[2]
    Q = d * d * n2 * n2 - (Tx * Tx + Ty * Ty + Tz * Tz)
    evanescent = Q < 0.0
    root = jnp.sqrt(jnp.where(evanescent, 0.0, Q))
    den = d * n2c
    # sign quirk preserved from the reference closed form: x/y carry
    # -n*sqrt(Q) while z carries +nz*sqrt(Q) (transmission; mirrored for
    # reflection), followed by renormalization (`real_rays.py:330-522`)
    s = -1.0 if is_reflective else 1.0
    L = (Tx - nx * root) / den
    M = (Ty - ny * root) / den
    N = (Tz + s * nz * root) / den
    mag = jnp.sqrt(L * L + M * M + N * N)
    return rays.replace(
        L=jnp.where(evanescent, rays.L, L / mag),
        M=jnp.where(evanescent, rays.M, M / mag),
        N=jnp.where(evanescent, rays.N, N / mag),
        i=jnp.where(evanescent, jnp.zeros_like(rays.i), rays.i),
    )


def reflect(rays: Rays, nx, ny, nz) -> Rays:
    """Mirror reflection at a surface with normal (nx, ny, nz)."""
    nx, ny, nz, cosi = _align_normal(rays, nx, ny, nz)
    return rays.replace(
        L=rays.L - 2.0 * cosi * nx,
        M=rays.M - 2.0 * cosi * ny,
        N=rays.N - 2.0 * cosi * nz,
    )
