"""Extract dispersion coefficients for common glasses into a compact JSON.

Reads the public refractiveindex.info mirror bundled with the mounted
reference (CC0 database) *through the reference's own Material resolution
logic*, so names map to the exact same YAML files, guaranteeing n(lambda)
parity. Produces optiland_tpu/data/glasses.json — data only, no code.

Usage: python tools/extract_catalog.py
"""
import json
import sys

sys.path.insert(0, "/tmp/refshim")
sys.path.insert(0, "/root/reference")

from optiland.materials.material import Material  # noqa: E402

NAMES = [
    "BASF2", "E-LLF6", "E-SF1", "FK3", "H-LAK52", "H-ZLAF52A", "J-LASF015",
    "J-LLF2", "K10", "L-BSL7", "LAC9", "LITHOTEC-CAF2", "M-TAF1", "N-BAK1",
    "N-BAK2", "N-BASF2", "N-BK7", "N-F2", "N-FK51", "N-K5", "N-KZFS4",
    "N-LAF32", "N-LAF33", "N-LAK12", "N-LAK21", "N-LAK7", "N-LAK9", "N-PSK3",
    "N-SF2", "S-LAH64", "N-SF11", "N-SK10", "N-SK11", "N-SK15", "N-SK16", "N-SK2", "N-SK4",
    "N-SK5", "N-SSK2", "N-ZK7", "Q-LAFPH1S", "S-FSL5", "S-LAL18", "SF1",
    "SF4", "SK15", "SK16", "BK7", "N-SF5", "N-SF6", "N-SF8", "N-SF10", "N-SF57", "N-SF66", "N-LAF2", "N-LAF7", "N-BAF10", "N-BAF52", "N-SSK5", "N-PK52A", "N-BK10", "N-KF9", "N-LASF31A", "N-PSK53A", "N-SK14", "LAFN7", "L-BAL35",
    "N-LASF44", "N-LAK34", "SF11", "SF5", "LAK9", "LLF1", "PK51A", "BAF10",
    "BAK1", "FK51A", "LASF9", "SSK4", "F5",
    ("CAF2", "Daimon-20"), ("F2", "schott"), ("F5", "schott"),
    ("LF5", "schott"), ("SF1", "schott"), ("SF15", "hikari"),
    ("SF2", "schott"), ("SF4", "hikari"), ("SF4", "schott"),
    ("SF5", "schott"), ("SF6", "schott"), ("SF10", "schott"),
    ("SF11", "schott"), ("SF56A", "schott"), ("SF57", "schott"),
]

FORMULA_CODE = {
    "formula 1": 1, "formula 2": 2, "formula 3": 3, "formula 4": 4,
    "formula 5": 5, "formula 6": 6, "formula 7": 7, "formula 8": 8,
    "formula 9": 9,
}

out = {}
for entry in NAMES:
    if isinstance(entry, tuple):
        name, catalog = entry
        key = f"{name.lower()}|{catalog.lower()}"
    else:
        name, catalog = entry, None
        key = name.lower()
    try:
        m = Material(name, reference=catalog) if catalog else Material(name)
        mf = m.material_file if hasattr(m, "material_file") else m
        formula = FORMULA_CODE.get(mf._n_formula)
        if formula is None:
            print(f"skip {key}: formula {mf._n_formula!r}")
            continue
        coeffs = [float(c) for c in mf.coefficients]
        out[key] = {
            "name": name,
            "catalog": catalog,
            "formula": formula,
            "coefficients": coeffs,
        }
        # tabulated extinction coefficient (absorption), if present
        if getattr(mf, "_k", None) is not None and getattr(
            mf, "_k_wavelength", None
        ) is not None:
            out[key]["k_wavelength"] = [float(v) for v in mf._k_wavelength]
            out[key]["k"] = [float(v) for v in mf._k]
        # sanity: check n at 0.55 um matches
        import numpy as np
        n_ref = float(np.asarray(m.n(0.55)))
        out[key]["n_at_0.55"] = n_ref
    except Exception as e:
        print(f"FAIL {key}: {e}")

with open("/root/repo/optiland_tpu/data/glasses.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote {len(out)} glasses")
