"""Generate optiland_tpu/models/zoo.py from the reference's sample designs.

The reference ships ~30 prebuilt sample systems (`optiland/samples/*.py`) —
public lens prescriptions from the literature (Laikin, patents, schematic
eyes). This build-time tool instantiates each reference sample and emits the
same prescription as optiland_tpu builder calls, guaranteeing the numbers
agree exactly for parity tests. The emitted file is data, not code logic.

Usage: python tools/gen_sample_zoo.py
"""

from __future__ import annotations

import sys
import types

import numpy as np

stub = types.ModuleType("numba")


def njit(*a, **k):
    if a and callable(a[0]):
        return a[0]
    return lambda fn: fn


stub.njit = njit
stub.jit = njit
stub.prange = range
sys.modules["numba"] = stub
sys.path.insert(0, "/root/reference")

SAMPLES = [
    ("objectives", [
        "TripletTelescopeObjective", "ObjectiveUS008879901",
        "TelescopeObjective48Inch", "HeliarLens", "TessarLens",
        "LensWithFieldCorrector", "PetzvalLens", "Telephoto",
        "WideAngle100FOV", "ProjectionLens120FOV", "ProjectionLens160FOV",
        "WideAngle170FOV",
    ]),
    ("eyepieces", ["EyepieceErfle"]),
    ("infrared", ["InfraredTriplet", "InfraredTripletF4"]),
    ("lithography", ["UVProjectionLens"]),
    ("microscopes", ["Objective60x", "Microscope20x",
                     "UVReflectingMicroscope"]),
    ("miscellaneous", ["NavarroWideAngleEye"]),
    ("simple", ["Edmund_49_847", "SingletStopSurf2", "TelescopeDoublet",
                "CementedAchromat", "AsphericSinglet"]),
    ("telescopes", ["HubbleTelescope"]),
]


def fmt(v) -> str:
    v = float(v)
    if np.isinf(v):
        return "math.inf" if v > 0 else "-math.inf"
    return repr(v)


def material_expr(m) -> str | None:
    from optiland.materials.abbe import AbbeMaterial
    from optiland.materials.ideal import IdealMaterial
    from optiland.materials.material import Material

    if isinstance(m, Material):
        if m.reference:
            return f"({m.name!r}, {m.reference!r})"
        return repr(m.name)
    if isinstance(m, AbbeMaterial):
        return (f"abbe_material({float(np.asarray(m.index))!r}, "
                f"{float(np.asarray(m.abbe))!r})")
    if isinstance(m, IdealMaterial):
        n = float(np.asarray(m.index).ravel()[0])
        if abs(n - 1.0) < 1e-12:
            return None  # air
        return repr(n)
    raise TypeError(f"unhandled material {type(m)}")


def emit_class(mod_name: str, cls_name: str) -> str:
    import importlib

    mod = importlib.import_module(f"optiland.samples.{mod_name}")
    ref = getattr(mod, cls_name)()

    lines = []
    L = lines.append
    doc = (ref.__doc__ or "").strip().splitlines()[0]
    L(f"class {cls_name}(Optic):")
    L(f'    """{doc}')
    L(f"    Prescription from the reference sample "
      f"`optiland/samples/{mod_name}.py` (public design data).\"\"\"")
    L("")
    L("    def __init__(self):")
    L("        super().__init__()")

    surfaces = ref.surface_group.surfaces
    pos = np.asarray(ref.surface_group.positions, float).ravel()
    for k, s in enumerate(surfaces):
        geom = s.geometry
        gname = type(geom).__name__
        radius = getattr(geom, "radius", np.inf)
        radius = float(np.asarray(radius).ravel()[0]) if np.ndim(radius) \
            else float(radius)
        conic = float(np.asarray(getattr(geom, "k", 0.0)).ravel()[0]) \
            if hasattr(geom, "k") else 0.0
        if k == 0:
            thickness = np.inf if ref.object_surface.is_infinite \
                else pos[1] - pos[0]
        elif k == len(surfaces) - 1:
            thickness = 0.0
        else:
            thickness = pos[k + 1] - pos[k]

        args = [f"index={k}"]
        if not np.isinf(radius):
            args.append(f"radius={fmt(radius)}")
        else:
            args.append("radius=math.inf")
        args.append(f"thickness={fmt(thickness)}")
        if conic:
            args.append(f"conic={fmt(conic)}")
        # reflective surfaces keep the incident medium: detect mirrors via
        # the interaction model
        im = type(s.interaction_model).__name__
        is_mirror = bool(getattr(s.interaction_model, "is_reflective", False)
                         or getattr(s, "is_reflective", False))
        if is_mirror:
            args.append('material="mirror"')
        else:
            mexpr = material_expr(s.material_post)
            if mexpr is not None:
                args.append(f"material={mexpr}")
        if s.is_stop:
            args.append("is_stop=True")
        if gname == "EvenAsphere":
            cs = [float(np.asarray(c).ravel()[0]) for c in geom.coefficients]
            args.append('surface_type="even_asphere"')
            args.append(f"coefficients=({', '.join(fmt(c) for c in cs)},)")
        elif gname not in ("Plane", "StandardGeometry"):
            raise TypeError(f"{cls_name}: unhandled geometry {gname}")
        ap = getattr(s, "aperture", None)
        if ap is not None:
            t = type(ap).__name__
            if t == "RadialAperture":
                rmax = float(np.asarray(ap.r_max).ravel()[0])
                rmin = float(np.asarray(ap.r_min).ravel()[0])
                args.append(f"aperture=RadialAperture(r_max={fmt(rmax)}, "
                            f"r_min={fmt(rmin)})")
            else:
                raise TypeError(f"{cls_name}: unhandled aperture {t}")
        body = ", ".join(args)
        L(f"        self.add_surface({body})")

    ap_type = ref.aperture.ap_type
    if ap_type == "float_by_stop_size":
        ap_type = "float_by_stop"
    L(f"        self.set_aperture(aperture_type={ap_type!r}, "
      f"value={fmt(ref.aperture.value)})")
    fd = type(ref.fields.field_definition).__name__
    ft = {"AngleField": "angle", "ObjectHeightField": "object_height",
          "ParaxialImageHeightField": "paraxial_image_height",
          "RealImageHeightField": "real_image_height"}[fd]
    L(f"        self.set_field_type({ft!r})")
    for f in ref.fields.fields:
        extras = ""
        if getattr(f, "vx", 0) or getattr(f, "vy", 0):
            extras = f", vx={fmt(f.vx)}, vy={fmt(f.vy)}"
        L(f"        self.add_field(y={fmt(f.y)}, x={fmt(f.x)}{extras})")
    for i, w in enumerate(ref.wavelengths.wavelengths):
        primary = ", is_primary=True" if w.is_primary else ""
        L(f"        self.add_wavelength(value={fmt(w.value)}{primary})")
    if getattr(ref, "obj_space_telecentric", False):
        L("        self.set_telecentric(True)")
    aim_mode = getattr(ref.ray_tracer, "ray_aiming_config", {}).get("mode",
                                                                    "paraxial")
    if aim_mode != "paraxial":
        L(f"        self.set_ray_aiming({aim_mode!r})")
    L("")
    return "\n".join(lines)


def main():
    header = '''"""Prebuilt sample systems (the reference's sample zoo).

Generated by `tools/gen_sample_zoo.py` from the public lens prescriptions in
`/root/reference/optiland/samples/*.py` (literature designs: Laikin, patents,
schematic eyes). Data-only module: every class is a prescription expressed
through the optiland_tpu builder; parity with the reference samples is
guaranteed by construction and checked in `tests/test_sample_zoo.py`.
"""

# ruff: noqa: E501

from __future__ import annotations

import math

from optiland_tpu.materials.catalog import abbe_material  # noqa: F401
from optiland_tpu.system.apertures import RadialAperture  # noqa: F401
from optiland_tpu.system.optic import Optic

'''
    blocks = []
    failures = []
    for mod_name, classes in SAMPLES:
        for cls in classes:
            try:
                blocks.append(emit_class(mod_name, cls))
                print(f"ok   {cls}")
            except Exception as e:  # noqa: BLE001
                failures.append((cls, str(e)))
                print(f"FAIL {cls}: {e}")
    out = header + "\n\n".join(blocks) + "\n"
    with open("/root/repo/optiland_tpu/models/zoo.py", "w") as f:
        f.write(out)
    print(f"wrote {len(blocks)} classes, {len(failures)} failures")


if __name__ == "__main__":
    main()
