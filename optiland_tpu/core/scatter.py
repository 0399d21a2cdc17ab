"""Surface scattering (BSDF) with counted-rejection sampling.

The reference's Numba-parallel rejection loop (`scatter.py:66-137`,
SURVEY.md §2.16) re-cast for TPU: a fixed attempt budget per ray with
per-ray key splitting — each attempt is fully vectorized, a mask keeps the
first in-hemisphere sample, and rays that exhaust the budget keep their
specular direction (probability ~0 for physical sigmas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _local_basis(L, M, N, nx, ny, nz):
    """Tangent basis (a, b) about the normal, matching the reference's
    arbitrary-vector construction (`scatter.py:88-97`)."""
    use_x = L < 0.999
    avx = jnp.where(use_x, 1.0, 0.0)
    avy = jnp.where(use_x, 0.0, 1.0)
    # a = n x arbitrary
    ax = ny * 0.0 - nz * avy
    ay = nz * avx - nx * 0.0
    az = nx * avy - ny * avx
    amag = jnp.sqrt(ax * ax + ay * ay + az * az)
    ax, ay, az = ax / amag, ay / amag, az / amag
    # b = n x a
    bx = ny * az - nz * ay
    by = nz * ax - nx * az
    bz = nx * ay - ny * ax
    return (ax, ay, az), (bx, by, bz)


def _sample_disk(key, shape, kind: str, sigma: float):
    kr, kt = jax.random.split(key)
    if kind == "lambertian":
        r = jnp.sqrt(jax.random.uniform(kr, shape))
        th = jax.random.uniform(kt, shape, minval=0.0, maxval=2.0 * jnp.pi)
        return r * jnp.cos(th), r * jnp.sin(th)
    # gaussian (Box-Muller)
    u1 = jax.random.uniform(kr, shape, minval=1e-12, maxval=1.0)
    u2 = jax.random.uniform(kt, shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = 2.0 * jnp.pi * u2
    return sigma * r * jnp.cos(th), sigma * r * jnp.sin(th)


def scatter_directions(key, L, M, N, nx, ny, nz, kind: str = "lambertian",
                       sigma: float = 0.1, budget: int = 8):
    """Scattered unit directions for every ray (batched rejection).

    Returns (L', M', N'). `kind` in {"lambertian", "gaussian"}.
    """
    # orient the normal into the outgoing hemisphere (our geometry normals
    # use the nz < 0 convention; scatter must be centered forward)
    sgn = jnp.sign(nx * L + ny * M + nz * N)
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
    (ax, ay, az), (bx, by, bz) = _local_basis(L, M, N, nx, ny, nz)
    r_dot_a = L * ax + M * ay + N * az
    r_dot_b = L * bx + M * by + N * bz

    shape = L.shape

    def attempt(carry, k):
        done, sx, sy = carry
        x, y = _sample_disk(k, shape, kind, sigma)
        cand_x = r_dot_a + x
        cand_y = r_dot_b + y
        ok = (1.0 - cand_x**2 - cand_y**2) >= 0.0
        take = ok & ~done
        sx = jnp.where(take, cand_x, sx)
        sy = jnp.where(take, cand_y, sy)
        return (done | ok, sx, sy), None

    keys = jax.random.split(key, budget)
    (done, sx, sy), _ = jax.lax.scan(
        attempt, (jnp.zeros(shape, bool), jnp.zeros(shape), jnp.zeros(shape)),
        keys)
    sz = jnp.sqrt(jnp.maximum(1.0 - sx**2 - sy**2, 0.0))
    Ls = sx * ax + sy * bx + sz * nx
    Ms = sx * ay + sy * by + sz * ny
    Ns = sx * az + sy * bz + sz * nz
    # unexhausted-budget fallback: keep the specular direction
    return (jnp.where(done, Ls, L), jnp.where(done, Ms, M),
            jnp.where(done, Ns, N))


class LambertianBSDF:
    kind = "lambertian"
    sigma = 0.0

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash("lambertian")


class GaussianBSDF:
    kind = "gaussian"

    def __init__(self, sigma: float):
        self.sigma = float(sigma)

    def __eq__(self, other):
        return type(self) is type(other) and self.sigma == other.sigma

    def __hash__(self):
        return hash(("gaussian", self.sigma))
