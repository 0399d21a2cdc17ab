"""CODE V .seq import.

Compact reader for the sequential CODE V subset the reference supports
(`optiland/fileio/codev/`): TITLE, EPD/FNO/NA apertures, WL (nm) + REF
primary index, XAN/YAN angle or YOB height fields, SO/S/SI surface rows
(radius thickness [glass|nd:vd|REFL]), STO stop marker, K conic and
A/B/C/D/E 4th..12th-order asphere coefficients.
"""

from __future__ import annotations

import math
import shlex

from optiland_tpu.materials.catalog import abbe_material, resolve_material
from optiland_tpu.system.optic import Optic


def _parse_glass(tok: str):
    if tok.upper() == "REFL":
        return "mirror"
    if ":" in tok:
        nd, vd = tok.split(":")
        return abbe_material(float(nd), float(vd))
    name = tok.split("_")[0]
    catalog = tok.split("_")[1].lower() if "_" in tok else None
    try:
        return resolve_material((name, catalog) if catalog else name)
    except KeyError:
        return resolve_material(name)


def load_codev_file(path: str) -> Optic:
    lines = open(path, encoding="latin-1").read().splitlines()

    title = None
    aperture = None
    wavelengths_nm = []
    ref_idx = 1
    yan, xan, yob = [], [], []
    field_type = "angle"
    surfaces = []  # dicts
    cur = None

    # CODE V asphere letters: A=r^4, B=r^6, C=r^8, D=r^10, E=r^12
    _ASPH = {"A": 1, "B": 2, "C": 3, "D": 4, "E": 5}

    for raw in lines:
        line = raw.split("!")[0].strip()
        if not line:
            continue
        t = shlex.split(line)
        key = t[0].upper()
        if key == "TITLE":
            title = t[1] if len(t) > 1 else None
        elif key == "EPD":
            aperture = ("EPD", float(t[1]))
        elif key == "FNO":
            aperture = ("imageFNO", float(t[1]))
        elif key == "NA":
            aperture = ("objectNA", float(t[1]))
        elif key == "WL":
            wavelengths_nm = [float(v) for v in t[1:]]
        elif key == "REF":
            ref_idx = int(t[1])
        elif key == "YAN":
            yan = [float(v) for v in t[1:]]
            field_type = "angle"
        elif key == "XAN":
            xan = [float(v) for v in t[1:]]
        elif key == "YOB":
            yob = [float(v) for v in t[1:]]
            field_type = "object_height"
        elif key in ("SO", "S", "SI"):
            cur = {"radius": float(t[1]) if len(t) > 1 else math.inf,
                   "thickness": float(t[2]) if len(t) > 2 else 0.0,
                   "glass": t[3] if len(t) > 3 else None,
                   "conic": 0.0, "asph": {}, "is_stop": False,
                   "kind": key}
            surfaces.append(cur)
        elif key == "STO" and cur is not None:
            cur["is_stop"] = True
        elif key == "K" and cur is not None:
            cur["conic"] = float(t[1])
        elif key in _ASPH and cur is not None and len(t) > 1:
            cur["asph"][_ASPH[key]] = float(t[1])

    lens = Optic(title)
    for i, s in enumerate(surfaces):
        radius = math.inf if s["radius"] == 0.0 else s["radius"]
        thickness = s["thickness"]
        if s["kind"] == "SO" and thickness >= 1e9:
            thickness = math.inf
        mat = "air"
        if s["glass"] is not None:
            mat = _parse_glass(s["glass"])
        kwargs = {}
        stype = "standard"
        if s["asph"]:
            stype = "even_asphere"
            top = max(s["asph"])
            coeffs = [0.0] * top
            for order, v in s["asph"].items():
                coeffs[order - 1] = v
            kwargs["coefficients"] = coeffs
        lens.add_surface(index=i, radius=radius, thickness=thickness,
                         conic=s["conic"], material=mat,
                         is_stop=s["is_stop"], surface_type=stype, **kwargs)

    if aperture is None:
        aperture = ("EPD", 10.0)
    lens.set_aperture(*aperture)
    lens.set_field_type(field_type)
    fields_y = yob if field_type == "object_height" else yan
    if not fields_y:
        fields_y = [0.0]
    if not xan:
        xan = [0.0] * len(fields_y)
    for fx, fy in zip(xan, fields_y):
        lens.add_field(y=fy, x=fx)
    for j, wnm in enumerate(wavelengths_nm or [550.0]):
        lens.add_wavelength(wnm * 1e-3, is_primary=(j + 1 == ref_idx))
    return lens
