"""Thin-film tolerancing: perturbations, sensitivity sweeps, Monte Carlo.

TPU-native counterpart of `optiland/thin_film/tolerancing/` (SURVEY.md §2.6).
The reference perturbs the stack object and re-evaluates serially
(`tolerancing/monte_carlo.py:31-153`); here the operand vector is one jitted
function of the layer-thickness vector, so a Monte-Carlo run is a single
`vmap` over the (N, L) matrix of perturbed thicknesses — the whole campaign
is one device launch, and it shards over a mesh like any other batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.thin_film.optimization import SpectralOperand, _as_tuple
from optiland_tpu.thin_film.stack import ThinFilmStack

__all__ = ["ThinFilmPerturbation", "ThinFilmTolerancing",
           "ThinFilmSensitivity", "ThinFilmMonteCarlo"]


@dataclass(frozen=True)
class ThinFilmPerturbation:
    """Thickness perturbation of one layer (reference
    `tolerancing/perturbation.py`): uniform over +-`range_nm`, or normal with
    `sigma_nm`."""

    layer_index: int
    range_nm: float | None = None
    sigma_nm: float | None = None

    def sample(self, key, n: int):
        if self.sigma_nm is not None:
            return jax.random.normal(key, (n,)) * (self.sigma_nm * 1e-3)
        r = (self.range_nm or 0.0) * 1e-3
        return jax.random.uniform(key, (n,), minval=-r, maxval=r)

    def sweep(self, num_steps: int):
        r = ((self.sigma_nm * 3.0) if self.sigma_nm is not None
             else (self.range_nm or 0.0)) * 1e-3
        return jnp.linspace(-r, r, num_steps)


class ThinFilmTolerancing:
    """Perturbations + operands on a stack (reference
    `tolerancing/core.py:18`)."""

    def __init__(self, stack: ThinFilmStack):
        self.stack = stack
        self.perturbations: list[ThinFilmPerturbation] = []
        self.operands: list[SpectralOperand] = []

    def add_perturbation(self, layer_index: int, range_nm: float | None = None,
                         sigma_nm: float | None = None):
        self.perturbations.append(
            ThinFilmPerturbation(layer_index, range_nm, sigma_nm))
        return self

    def add_operand(self, property: str, wavelength_nm=550.0, aoi_deg=0.0,
                    polarization: str = "u"):
        """Track the value of R/T/A at a spectral point (no target — the
        tolerancing output is the value distribution)."""
        wl = _as_tuple(wavelength_nm)
        aoi = _as_tuple(aoi_deg)
        n = max(len(wl), len(aoi))
        if len(wl) == 1:
            wl = wl * n
        if len(aoi) == 1:
            aoi = aoi * n
        self.operands.append(SpectralOperand(
            prop=property, wavelength_nm=wl, aoi_deg=aoi,
            polarization=polarization, target_type="equal",
            value=(0.0,) * n, weight=1.0))
        return self

    def _base_thickness(self):
        return jnp.asarray([float(np.asarray(lay.thickness_um))
                            for lay in self.stack.layers])

    def _values_fn(self):
        """Jitted (L,)-thickness -> concatenated operand values."""
        stack = self.stack
        operands = tuple(self.operands)

        def values(th):
            out = []
            for op in operands:
                w_um = jnp.asarray(op.wavelength_nm) * 1e-3
                aoi = jnp.deg2rad(jnp.asarray(op.aoi_deg))
                from optiland_tpu.thin_film.optimization import _stack_rta

                R, T, A = _stack_rta(stack, th, w_um, aoi, op.polarization)
                out.append(jnp.atleast_1d({"R": R, "T": T, "A": A}[op.prop]))
            return jnp.concatenate(out)

        return values

    def evaluate(self) -> np.ndarray:
        return np.asarray(self._values_fn()(self._base_thickness()))


class ThinFilmSensitivity(ThinFilmTolerancing):
    """Per-perturbation sweep of every operand (reference
    `tolerancing/sensitivity_analysis.py:28`)."""

    def run(self, num_steps: int = 11) -> dict:
        base = self._base_thickness()
        values = jax.jit(self._values_fn())
        results = {}
        for p in self.perturbations:
            deltas = p.sweep(num_steps)
            ths = base[None, :].repeat(num_steps, 0)
            ths = ths.at[:, p.layer_index].add(deltas)
            vals = jax.vmap(values)(ths)
            results[p.layer_index] = {
                "delta_nm": np.asarray(deltas) * 1e3,
                "values": np.asarray(vals),
            }
        return results


class ThinFilmMonteCarlo(ThinFilmTolerancing):
    """Vectorized Monte Carlo over perturbation draws (reference
    `tolerancing/monte_carlo.py:31`): one vmapped evaluation for all trials."""

    def run(self, num_trials: int = 1000, seed: int = 0) -> dict:
        base = self._base_thickness()
        key = jax.random.PRNGKey(seed)
        ths = base[None, :].repeat(num_trials, 0)
        for i, p in enumerate(self.perturbations):
            deltas = p.sample(jax.random.fold_in(key, i), num_trials)
            ths = ths.at[:, p.layer_index].add(deltas)
        ths = jnp.maximum(ths, 0.0)
        vals = jax.jit(jax.vmap(self._values_fn()))(ths)
        vals = np.asarray(vals)
        return {
            "thicknesses_um": np.asarray(ths),
            "values": vals,
            "mean": vals.mean(axis=0),
            "std": vals.std(axis=0),
            "p05": np.percentile(vals, 5, axis=0),
            "p95": np.percentile(vals, 95, axis=0),
        }
