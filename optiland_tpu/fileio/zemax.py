"""Zemax .zmx import.

A compact tokenizing reader for the sequential-mode .zmx files the reference
supports (`optiland/fileio/zemax/`): UNIT/ENPD/FNUM/OBNA, FTYP + XFLN/YFLN
fields, WAVM wavelengths + PWAV primary, SURF blocks with TYPE
STANDARD/EVENASPH, CURV, DISZ, CONI, PARM (asphere terms), GLAS (catalog
name with (n_d, V_d) Abbe fallback), STOP, MIRROR, DIAM apertures.
"""

from __future__ import annotations

import math
import re

from optiland_tpu.materials.catalog import abbe_material, resolve_material
from optiland_tpu.system.optic import Optic


def _tokens(line: str):
    return line.strip().split()


def _parse_float(s: str) -> float:
    if s.upper() in ("INFINITY", "INF"):
        return math.inf
    return float(s)


def load_zemax_file(path: str) -> Optic:
    """Parse a .zmx file into an Optic."""
    # zemax files come in several encodings (utf-16 with BOM, latin-1)
    raw = open(path, "rb").read()
    for enc in ("utf-16", "utf-8-sig", "latin-1"):
        try:
            text = raw.decode(enc)
            if "SURF" in text or "MODE" in text:
                break
        except UnicodeError:
            continue
    lines = text.splitlines()

    aperture_type, aperture_value = None, None
    fields_x, fields_y = [], []
    field_type = "angle"
    wavelengths = []  # (index, value)
    primary_wav_idx = None
    surfaces = {}  # idx -> dict
    cur = None
    obj_na = None

    for line in lines:
        if not line.strip():
            continue
        indented = line[:1] in (" ", "\t")
        t = _tokens(line)
        key = t[0].upper()

        if not indented:
            cur = None
            if key == "ENPD":
                aperture_type, aperture_value = "EPD", _parse_float(t[1])
            elif key == "FNUM":
                aperture_type, aperture_value = "imageFNO", _parse_float(t[1])
            elif key == "OBNA":
                aperture_type, aperture_value = "objectNA", _parse_float(t[1])
                obj_na = aperture_value
            elif key == "FTYP":
                # field type: 0 angle, 1 object height, 2/3 image height
                ft = int(t[1])
                field_type = {0: "angle", 1: "object_height"}.get(ft, "angle")
            elif key == "XFLN":
                fields_x = [float(v) for v in t[1:]]
            elif key == "YFLN":
                fields_y = [float(v) for v in t[1:]]
            elif key == "WAVM":
                wavelengths.append((int(t[1]), float(t[2])))
            elif key == "PWAV":
                primary_wav_idx = int(t[1])
            elif key == "SURF":
                cur = {"type": "STANDARD", "curv": 0.0, "disz": 0.0,
                       "conic": 0.0, "parm": {}, "glass": None,
                       "is_stop": False, "mirror": False, "diam": None}
                surfaces[int(t[1])] = cur
            continue

        if cur is None:
            continue
        if key == "TYPE":
            cur["type"] = t[1].upper()
        elif key == "CURV":
            cur["curv"] = _parse_float(t[1])
        elif key == "DISZ":
            cur["disz"] = _parse_float(t[1])
        elif key == "CONI":
            cur["conic"] = _parse_float(t[1])
        elif key == "PARM":
            cur["parm"][int(t[1])] = _parse_float(t[2])
        elif key == "GLAS":
            name = t[1]
            if name.upper() == "MIRROR":
                cur["mirror"] = True
            else:
                nd = float(t[4]) if len(t) > 4 else None
                vd = float(t[5]) if len(t) > 5 else None
                cur["glass"] = (name, nd, vd)
        elif key == "STOP":
            cur["is_stop"] = True
        elif key == "MIRROR":
            cur["mirror"] = True
        elif key == "DIAM":
            cur["diam"] = _parse_float(t[1])

    # drop trailing wavelengths that WAVM lists beyond the used count? The
    # reference uses all WAVM rows with weight > 0; files list exactly the
    # used set. Keep all unique indices in order.
    wavelengths.sort()

    lens = Optic()
    n_surf = max(surfaces) + 1
    has_cb = any(surfaces[i]["type"] == "COORDBRK" for i in surfaces)

    # cumulative coordinate system for COORDBRK chains (reference
    # `fileio/zemax/reader/converter.py` coordinate-break path): rotations/
    # decenters first, then the CB thickness along the rotated z
    import numpy as np

    from optiland_tpu.core.transforms import rotation_matrix

    R_cum = np.eye(3)
    t_cum = np.zeros(3)

    def _euler_from_R(R):
        # R = Rz(rz) @ Ry(ry) @ Rx(rx)
        ry = math.asin(-min(1.0, max(-1.0, R[2, 0])))
        rx = math.atan2(R[2, 1], R[2, 2])
        rz = math.atan2(R[1, 0], R[0, 0])
        return rx, ry, rz

    out_idx = 0
    for idx in range(n_surf):
        s = surfaces[idx]

        if s["type"] == "COORDBRK":
            dx = s["parm"].get(1, 0.0)
            dy = s["parm"].get(2, 0.0)
            rx = math.radians(s["parm"].get(3, 0.0))
            ry = math.radians(s["parm"].get(4, 0.0))
            rz = math.radians(s["parm"].get(5, 0.0))
            t_cum = t_cum + R_cum @ np.asarray([dx, dy, 0.0])
            R_cum = R_cum @ np.asarray(rotation_matrix(rx, ry, rz))
            t_cum = t_cum + R_cum @ np.asarray([0.0, 0.0, s["disz"]])
            continue

        radius = math.inf if s["curv"] == 0 else 1.0 / s["curv"]
        mat = "air"
        if s["mirror"]:
            mat = "mirror"
        elif s["glass"] is not None:
            name, nd, vd = s["glass"]
            try:
                mat = resolve_material(name)
            except KeyError:
                if nd is not None and vd:
                    mat = abbe_material(nd, vd)
                else:
                    raise
        kwargs = {}
        surface_type = "standard"
        if s["type"] == "EVENASPH":
            surface_type = "even_asphere"
            pk = sorted(s["parm"])
            kwargs["coefficients"] = [s["parm"][p] for p in pk]
        elif s["type"] == "TOROIDAL":
            surface_type = "toroidal"
        spec = lens.add_surface(
            index=out_idx, radius=radius, thickness=s["disz"],
            conic=s["conic"], material=mat, is_stop=s["is_stop"],
            surface_type=surface_type, aperture=s["diam"], **kwargs,
        )
        if has_cb and out_idx > 0 and math.isfinite(s["disz"]):
            rx_, ry_, rz_ = _euler_from_R(R_cum)
            spec.abs_cs = (float(t_cum[0]), float(t_cum[1]),
                           float(t_cum[2]), rx_, ry_, rz_)
        out_idx += 1

        if math.isfinite(s["disz"]):
            t_cum = t_cum + R_cum @ np.asarray([0.0, 0.0, s["disz"]])

    if aperture_type is None:
        aperture_type, aperture_value = "EPD", 10.0
    lens.set_aperture(aperture_type, aperture_value)
    del obj_na

    lens.set_field_type(field_type)
    if not fields_y:
        fields_y = [0.0]
        fields_x = [0.0]
    if not fields_x:
        fields_x = [0.0] * len(fields_y)
    for fx, fy in zip(fields_x, fields_y):
        lens.add_field(y=fy, x=fx)

    for j, (widx, wval) in enumerate(wavelengths):
        lens.add_wavelength(wval, is_primary=(widx == primary_wav_idx))
    if primary_wav_idx is None and wavelengths:
        lens.wavelengths.primary_idx = len(wavelengths) // 2

    return lens


_ = re  # parsing is token-based; regex kept for future block formats
