"""Build the full bundled material database from the reference's RII mirror.

Parses every row of the reference's `database/catalog_nk.csv` (a public CC0
refractiveindex.info mirror) directly from the YAML files into a compact
gzipped JSON of dispersion coefficients / tabulated n,k / Schott thermal
coefficients. This is a build-time data extraction (SURVEY.md §2.7 note:
"keep the database + YAML parsing as host-side Python") — no reference code
ships; only public data does.

YAML semantics mirror `optiland/materials/material_file.py:461-521`:
  - DATA blocks: "formula N" -> coefficients, "tabulated n"/"tabulated nk"
    -> n table (plus k for nk), "tabulated k" -> k table.
  - SPECS.thermal_dispersion (Schott type) -> 6 thermal coefficients;
    SPECS.temperature -> reference temperature.

Usage: python tools/build_full_catalog.py
"""

from __future__ import annotations

import gzip
import io
import json
import os

import numpy as np
import pandas as pd
import yaml

try:
    Loader = yaml.CSafeLoader
except AttributeError:
    Loader = yaml.SafeLoader

BASE = "/root/reference/optiland/database"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "optiland_tpu", "data", "catalog_full.json.gz")


def parse_yaml(path):
    with open(path) as f:
        data = yaml.load(f, Loader=Loader)
    rec = {}
    for sub in data.get("DATA", []) or []:
        t = sub.get("type", "")
        if t.startswith("formula "):
            rec["formula"] = int(t.split()[1])
            rec["coeffs"] = [float(k) for k in sub.get("coefficients", "").split()]
        elif t.startswith("tabulated"):
            arr = np.loadtxt(io.StringIO(sub.get("data", "")))
            if arr.ndim == 1:
                arr = arr.reshape(1, -1) if arr.size else arr.reshape(0, 0)
            if t == "tabulated n":
                rec["nt"] = [arr[:, 0].tolist(), arr[:, 1].tolist()]
            elif t == "tabulated k":
                rec["kt"] = [arr[:, 0].tolist(), arr[:, 1].tolist()]
            elif t == "tabulated nk":
                rec["nt"] = [arr[:, 0].tolist(), arr[:, 1].tolist()]
                rec["kt"] = [arr[:, 0].tolist(), arr[:, 2].tolist()]
    specs = data.get("SPECS") or {}
    try:
        coeff = specs["thermal_dispersion"][0]
        if coeff.get("type", "").startswith("Schott"):
            rec["therm"] = [float(k) for k in coeff.get("coefficients", "").split()]
        rec["t0"] = float(str(specs["temperature"]).split(" ")[0])
    except (KeyError, IndexError, ValueError):
        pass
    return rec


def main():
    df = pd.read_csv(os.path.join(BASE, "catalog_nk.csv"))
    rows, fails = [], 0
    for _, r in df.iterrows():
        row = {
            "g": r["group"],
            "c": str(r["category_name"]),
            "cf": str(r["category_name_full"]),
            "r": str(r["reference"]),
            "n": str(r["name"]),
            "f": str(r["filename_no_ext"]),
            "file": str(r["filename"]),
            "wmin": float(r["min_wavelength"]),
            "wmax": float(r["max_wavelength"]),
        }
        try:
            row.update(parse_yaml(os.path.join(BASE, "data-nk", r["filename"])))
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"FAIL {r['filename']}: {e}")
        rows.append(row)
    payload = json.dumps({"rows": rows}, separators=(",", ":"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt", compresslevel=9) as f:
        f.write(payload)
    print(f"wrote {len(rows)} rows ({fails} failures), "
          f"{os.path.getsize(OUT)/1e6:.1f} MB gz / {len(payload)/1e6:.1f} MB raw")


if __name__ == "__main__":
    main()
