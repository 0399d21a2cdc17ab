"""Host-side glass catalog.

Replaces the reference's CSV + refractiveindex.info YAML resolution pipeline
(`optiland/materials/material.py:22`, `material_file.py`) with a compact
bundled JSON of dispersion coefficients (public CC0 refractiveindex.info
data, extracted by `tools/extract_catalog.py` through the reference's own
name resolution so indices agree exactly). An external refractiveindex.info
mirror can be layered on later; the bundled set covers every glass used by
the reference's sample systems.

`resolve_material` maps user material specs — a number (ideal index), a glass
name, a `(name, catalog)` tuple, "air", or "mirror" — to a `MaterialSpec`
(static formula code + coefficient tuple) consumed by the system builder.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

from optiland_tpu.materials.dispersion import FORMULA_IDEAL

_DATA_PATH = Path(__file__).resolve().parent.parent / "data" / "glasses.json"


@dataclass(frozen=True)
class MaterialSpec:
    """Static description of a material (hashable; lives in SystemStatic).

    `k_table` is an optional (wavelengths_um, k_values) pair of tuples — the
    tabulated extinction coefficient from refractiveindex.info, interpolated
    at trace time for Beer-Lambert absorption (the reference does the same:
    `materials/material_file.py:233-248`, `propagation/homogeneous.py:44-53`).
    """

    formula: int
    coefficients: tuple[float, ...]
    name: str = ""
    mirror: bool = False
    k_table: tuple[tuple[float, ...], tuple[float, ...]] | None = None

    @property
    def n_coeffs(self) -> int:
        return len(self.coefficients)


AIR = MaterialSpec(formula=FORMULA_IDEAL, coefficients=(1.0,), name="air")


def abbe_material(index: float, abbe: float) -> MaterialSpec:
    """Material from (n_d, V_d) via the polynomial glass model
    (reference `materials/abbe.py:38-82`; fitted Schott-catalog
    coefficients bundled as public data)."""
    import numpy as np

    from optiland_tpu.materials.dispersion import FORMULA_POLYVAL

    C = np.load(
        Path(__file__).resolve().parent.parent
        / "data" / "glass_model_coefficients.npy"
    )
    X = np.array([index, abbe, index**2, abbe**2, index**3, abbe**3])
    p = X @ C
    return MaterialSpec(
        formula=FORMULA_POLYVAL,
        coefficients=tuple(float(v) for v in p),
        name=f"abbe({index!r},{abbe!r})",
    )
MIRROR = MaterialSpec(formula=FORMULA_IDEAL, coefficients=(1.0,), name="mirror",
                      mirror=True)


@lru_cache(maxsize=1)
def _load_catalog() -> dict:
    with open(_DATA_PATH) as f:
        return json.load(f)


def catalog_names() -> list[str]:
    return sorted(_load_catalog())


def resolve_material(spec) -> MaterialSpec:
    """Resolve a user material spec to a MaterialSpec.

    Accepts: None/"air", "mirror", a number (ideal constant index), a
    MaterialSpec (passthrough), a glass name, or a (name, catalog) tuple.
    """
    if spec is None:
        return AIR
    if isinstance(spec, MaterialSpec):
        return spec
    if isinstance(spec, (int, float)):
        return MaterialSpec(FORMULA_IDEAL, (float(spec),), name=f"ideal({spec})")
    if isinstance(spec, tuple):
        name, catalog = spec
        key = f"{name.lower()}|{catalog.lower()}"
    else:
        name = str(spec)
        if name.lower() == "air":
            return AIR
        if name.lower() == "mirror":
            return MIRROR
        key = name.lower()

    cat = _load_catalog()
    if key not in cat and "|" not in key:
        # fall back: any catalog-qualified entry for this glass name
        matches = [k for k in cat if k.split("|")[0] == key]
        if len(matches) == 1:
            key = matches[0]
    try:
        entry = cat[key]
    except KeyError:
        raise KeyError(
            f"Material {spec!r} not in bundled catalog "
            f"({len(cat)} glasses). Known names: {catalog_names()[:10]}..."
        ) from None
    k_table = None
    if "k" in entry:
        k_table = (
            tuple(float(v) for v in entry["k_wavelength"]),
            tuple(float(v) for v in entry["k"]),
        )
    return MaterialSpec(
        formula=int(entry["formula"]),
        coefficients=tuple(float(c) for c in entry["coefficients"]),
        name=entry["name"],
        k_table=k_table,
    )
