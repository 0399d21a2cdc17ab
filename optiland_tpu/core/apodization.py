"""Pupil apodization: intensity weighting of the launch rays.

Counterpart of the reference's `optiland/apodization/*` registry. Each
apodization is a pure function of normalized pupil coordinates, applied in
`generate_rays` exactly where the reference's RayGenerator applies it
(`rays/ray_generator.py:81-85`). Jittable and differentiable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


class BaseApodization:
    def get_intensity(self, Px, Py):
        raise NotImplementedError

    def __hash__(self):
        return hash((type(self).__name__,) + tuple(sorted(vars(self).items())))

    def __eq__(self, other):
        return type(self) is type(other) and vars(self) == vars(other)


class UniformApodization(BaseApodization):
    def get_intensity(self, Px, Py):
        return jnp.ones_like(Px)


@dataclass(frozen=True, eq=True)
class GaussianApodization(BaseApodization):
    sigma: float = 1.0

    def get_intensity(self, Px, Py):
        return jnp.exp(-(Px**2 + Py**2) / (2.0 * self.sigma**2))


@dataclass(frozen=True, eq=True)
class CosineSquaredApodization(BaseApodization):
    R: float = 1.0

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        inten = jnp.cos(jnp.pi * r / (2.0 * self.R)) ** 2
        return jnp.where(r < self.R, inten, 0.0)


@dataclass(frozen=True, eq=True)
class HannApodization(BaseApodization):
    D: float = 2.0

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        inten = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * r / self.D))
        return jnp.where(r < self.D / 2.0, inten, 0.0)


@dataclass(frozen=True, eq=True)
class TukeyApodization(BaseApodization):
    R: float = 1.0
    alpha: float = 0.5

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        a = self.alpha
        flat = r <= self.R * (1.0 - a)
        taper = 0.5 * (1.0 + jnp.cos(
            jnp.pi / jnp.maximum(a, 1e-12)
            * (r / self.R - 1.0 + a)
        ))
        inten = jnp.where(flat, 1.0, taper)
        return jnp.where(r <= self.R, inten, 0.0)


@dataclass(frozen=True, eq=True)
class SuperGaussianApodization(BaseApodization):
    w: float = 1.0
    n: float = 2.0

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        return jnp.exp(-((r / self.w) ** self.n))


@dataclass(frozen=True, eq=True)
class PolynomialApodization(BaseApodization):
    R: float = 1.0
    p: float = 1.0

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        inten = (1.0 - (r / self.R) ** 2) ** self.p
        return jnp.where(r < self.R, inten, 0.0)


_REGISTRY = {
    "uniform": UniformApodization,
    "gaussian": GaussianApodization,
    "cosine_squared": CosineSquaredApodization,
    "hann": HannApodization,
    "tukey": TukeyApodization,
    "super_gaussian": SuperGaussianApodization,
    "polynomial": PolynomialApodization,
}


def make_apodization(spec) -> BaseApodization:
    """None | name | (name, **kwargs via dict) | instance -> apodization."""
    if spec is None:
        return UniformApodization()
    if isinstance(spec, BaseApodization):
        return spec
    if isinstance(spec, str):
        return _REGISTRY[spec]()
    name, kwargs = spec
    return _REGISTRY[name](**kwargs)
