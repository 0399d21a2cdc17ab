"""Thin-film stack: layer list + spectra helpers.

Host-side shell over the jittable TMM core, mirroring the reference's
`ThinFilmStack` (`thin_film/stack.py:34-446`): add_layer / add_layer_nm /
add_layer_qwot, R/T/A spectra for 's'/'p'/'unpolarized', insert/remove/split
for needle synthesis. Materials are `MaterialSpec`s (or numbers) resolved
through the same catalog as lens materials.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

import jax.numpy as jnp

from optiland_tpu import config

from optiland_tpu.materials.catalog import resolve_material
from optiland_tpu.materials.dispersion import material_extinction, material_index
from optiland_tpu.thin_film.core import tmm_coh


@dataclass(frozen=True)
class Layer:
    material: object  # MaterialSpec
    thickness_um: object  # float or traced jax scalar (differentiable)

    def n_complex(self, wavelength_um):
        m = self.material
        n = material_index(m.formula, m.n_coeffs,
                           jnp.asarray(m.coefficients), wavelength_um)
        if m.k_table is not None:
            k = jnp.interp(jnp.asarray(wavelength_um),
                           jnp.asarray(m.k_table[0]),
                           jnp.asarray(m.k_table[1]))
        else:
            k = material_extinction(m.formula, m.n_coeffs,
                                    jnp.asarray(m.coefficients), wavelength_um)
        return n + config.imag_unit() * k


class ThinFilmStack:
    """Ordered coating layers between an incident and substrate medium."""

    def __init__(self, incident_material="air", substrate_material="air"):
        self.incident_material = resolve_material(incident_material)
        self.substrate_material = resolve_material(substrate_material)
        self.layers: list[Layer] = []

    def __len__(self):
        return len(self.layers)

    # -- construction (reference `stack.py:126-180`) ------------------------
    def add_layer(self, material, thickness_um):
        self.layers.append(Layer(resolve_material(material), thickness_um))
        return self

    def add_layer_nm(self, material, thickness_nm: float):
        return self.add_layer(material, thickness_nm * 1e-3)

    def add_layer_qwot(self, material, wavelength_um: float,
                       qwot: float = 1.0):
        """Quarter-wave optical thickness layer at `wavelength_um`."""
        m = resolve_material(material)
        n = float(np.asarray(material_index(
            m.formula, m.n_coeffs, jnp.asarray(m.coefficients), wavelength_um
        )))
        return self.add_layer(m, qwot * wavelength_um / (4.0 * n))

    def insert_layer(self, index: int, material, thickness_um):
        self.layers.insert(index, Layer(resolve_material(material),
                                        thickness_um))
        return self

    def remove_layer(self, index: int) -> Layer:
        return self.layers.pop(index)

    def split_layer(self, layer_index: int, position_fraction: float):
        """Split a layer in two (needle-synthesis helper)."""
        lay = self.layers[layer_index]
        t1 = lay.thickness_um * position_fraction
        t2 = lay.thickness_um - t1
        self.layers[layer_index] = replace(lay, thickness_um=t1)
        self.layers.insert(layer_index + 1, replace(lay, thickness_um=t2))
        return self

    def copy(self) -> "ThinFilmStack":
        new = ThinFilmStack(self.incident_material, self.substrate_material)
        new.layers = list(self.layers)
        return new

    # -- spectra ------------------------------------------------------------
    def _indices(self, w):
        n0m, nsm = self.incident_material, self.substrate_material
        mk = lambda m: (  # noqa: E731
            material_index(m.formula, m.n_coeffs, jnp.asarray(m.coefficients), w)
            + config.imag_unit()
            * (jnp.interp(jnp.asarray(w), jnp.asarray(m.k_table[0]),
                               jnp.asarray(m.k_table[1]))
                    if m.k_table is not None else
                    material_extinction(m.formula, m.n_coeffs,
                                        jnp.asarray(m.coefficients), w))
        )
        return mk(n0m), mk(nsm)

    def compute_rtRTA(self, wavelength_um, aoi_rad=0.0, pol: str = "s"):
        """(r, t, R, T, A) over a wavelength/AOI grid (reference
        `stack.py:191-230`). pol in {'s', 'p'}."""
        w = jnp.asarray(wavelength_um)
        n0, ns = self._indices(w)
        layer_n = [lay.n_complex(w) for lay in self.layers]
        layer_d = [lay.thickness_um for lay in self.layers]
        return tmm_coh(n0, ns, layer_n, layer_d, w, jnp.asarray(aoi_rad), pol)

    def _rta(self, wavelength_um, aoi_rad, pol):
        if pol in ("s", "p"):
            _, _, R, T, A = self.compute_rtRTA(wavelength_um, aoi_rad, pol)
            return R, T, A
        # unpolarized: average of s and p
        _, _, Rs, Ts, As = self.compute_rtRTA(wavelength_um, aoi_rad, "s")
        _, _, Rp, Tp, Ap = self.compute_rtRTA(wavelength_um, aoi_rad, "p")
        return (Rs + Rp) / 2, (Ts + Tp) / 2, (As + Ap) / 2

    def reflectance(self, wavelength_um, aoi_rad=0.0, pol: str = "u"):
        return self._rta(wavelength_um, aoi_rad, pol)[0]

    def transmittance(self, wavelength_um, aoi_rad=0.0, pol: str = "u"):
        return self._rta(wavelength_um, aoi_rad, pol)[1]

    def absorptance(self, wavelength_um, aoi_rad=0.0, pol: str = "u"):
        return self._rta(wavelength_um, aoi_rad, pol)[2]

    # nm/deg conveniences (reference `stack.py:256-344`)
    def reflectance_nm_deg(self, wavelength_nm, aoi_deg=0.0, pol: str = "u"):
        return self.reflectance(jnp.asarray(wavelength_nm) * 1e-3,
                                jnp.deg2rad(jnp.asarray(aoi_deg)), pol)

    def transmittance_nm_deg(self, wavelength_nm, aoi_deg=0.0, pol: str = "u"):
        return self.transmittance(jnp.asarray(wavelength_nm) * 1e-3,
                                  jnp.deg2rad(jnp.asarray(aoi_deg)), pol)

    def absorptance_nm_deg(self, wavelength_nm, aoi_deg=0.0, pol: str = "u"):
        return self.absorptance(jnp.asarray(wavelength_nm) * 1e-3,
                                jnp.deg2rad(jnp.asarray(aoi_deg)), pol)

    def jones_matrices(self, k0, k1, wavelength_um, aoi_rad, reflect: bool):
        """(N, 3, 3) Jones matrices from the stack's rs/rp or ts/tp — the
        ThinFilmCoating bridge (reference `coatings.py:488-605`)."""
        rs, ts, *_ = self.compute_rtRTA(wavelength_um, aoi_rad, "s")
        rp, tp, *_ = self.compute_rtRTA(wavelength_um, aoi_rad, "p")
        from optiland_tpu.polarization.jones import _assemble

        if reflect:
            return _assemble(rs, 0.0, 0.0, -rp, -1.0, k0.shape[0])
        return _assemble(ts, 0.0, 0.0, tp, 1.0, k0.shape[0])
