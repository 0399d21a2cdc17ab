"""Analysis registry — the single source of truth for which core analyses
the GUI exposes (reference `optiland_gui/registry.py:1-79`).

Each entry is ``(category, display_name, dotted_class_path)``; classes are
imported lazily so the GUI starts fast and a broken analysis import breaks
only its own entry.  On top of the reference's list we also derive a
*settings schema* from each constructor signature (the reference GUI builds
its settings widgets the same way, via ``inspect`` in
`optiland_gui/analysis_panel.py:544-660`), so the panel — and the headless
tests — can enumerate every tunable parameter with its default.
"""

from __future__ import annotations

import importlib
import inspect

ANALYSIS_REGISTRY: list[tuple[str, str, str]] = [
    # Spot & Ray
    ("Spot & Ray", "Spot Diagram", "optiland_tpu.analysis.SpotDiagram"),
    ("Spot & Ray", "Ray Fan", "optiland_tpu.analysis.RayFan"),
    ("Spot & Ray", "Best-Fit Ray Fan",
     "optiland_tpu.analysis.BestFitRayFan"),
    ("Spot & Ray", "Through-Focus Spot",
     "optiland_tpu.analysis.ThroughFocusSpotDiagram"),
    ("Spot & Ray", "Encircled Energy",
     "optiland_tpu.analysis.EncircledEnergy"),
    ("Spot & Ray", "RMS Spot Size vs Field",
     "optiland_tpu.analysis.RmsSpotSizeVsField"),
    # Wavefront
    ("Wavefront", "OPD", "optiland_tpu.wavefront.OPD"),
    ("Wavefront", "OPD Fan", "optiland_tpu.wavefront.OPDFan"),
    ("Wavefront", "Zernike OPD", "optiland_tpu.wavefront.ZernikeOPD"),
    ("Wavefront", "RMS Wavefront vs Field",
     "optiland_tpu.analysis.RmsWavefrontErrorVsField"),
    # PSF
    ("PSF", "FFT PSF", "optiland_tpu.psf.FFTPSF"),
    ("PSF", "Huygens PSF", "optiland_tpu.psf.HuygensPSF"),
    ("PSF", "MMDFT PSF", "optiland_tpu.psf.MMDFTPSF"),
    # MTF
    ("MTF", "Geometric MTF", "optiland_tpu.mtf.GeometricMTF"),
    ("MTF", "FFT MTF", "optiland_tpu.mtf.FFTMTF"),
    ("MTF", "MTF vs Field", "optiland_tpu.analysis.MTFvsField"),
    # Aberrations
    ("Aberrations", "YYbar", "optiland_tpu.analysis.YYbar"),
    ("Aberrations", "Pupil Aberration",
     "optiland_tpu.analysis.PupilAberration"),
    ("Aberrations", "Angle vs Height", "optiland_tpu.analysis.AngleVsHeight"),
    ("Aberrations", "Field Curvature",
     "optiland_tpu.analysis.FieldCurvature"),
    # Distortion
    ("Distortion", "Distortion", "optiland_tpu.analysis.Distortion"),
    ("Distortion", "Grid Distortion",
     "optiland_tpu.analysis.GridDistortion"),
    # Radiometry
    ("Radiometry", "Incoherent Irradiance",
     "optiland_tpu.analysis.IncoherentIrradiance"),
    ("Radiometry", "Radiant Intensity",
     "optiland_tpu.analysis.RadiantIntensity"),
    # Polarization
    ("Polarization", "Jones Pupil", "optiland_tpu.analysis.JonesPupil"),
]


def categories() -> list[str]:
    """Ordered unique category headers for the selector combo."""
    seen: list[str] = []
    for cat, _, _ in ANALYSIS_REGISTRY:
        if cat not in seen:
            seen.append(cat)
    return seen


def names(category: str | None = None) -> list[str]:
    return [disp for cat, disp, _ in ANALYSIS_REGISTRY
            if category is None or cat == category]


def resolve(display_name: str) -> type:
    """Import and return the analysis class for a display name."""
    for _, disp, path in ANALYSIS_REGISTRY:
        if disp == display_name:
            module, _, cls = path.rpartition(".")
            return getattr(importlib.import_module(module), cls)
    raise KeyError(f"Unknown analysis {display_name!r}")


def settings_schema(display_name: str) -> dict[str, dict]:
    """Constructor-derived settings: {param: {default, annotation, kind}}.

    The first positional parameter (the optic) is excluded; everything else
    is a user-tunable setting the panel renders as a widget (spinbox for
    numbers, checkbox for bools, line edit otherwise) — mirroring the
    reference's dynamic settings generation.
    """
    cls = resolve(display_name)
    sig = inspect.signature(cls.__init__)
    params = list(sig.parameters.values())[1:]  # drop self
    schema: dict[str, dict] = {}
    for i, p in enumerate(params):
        if i == 0 and p.default is inspect.Parameter.empty:
            continue  # the optic argument
        if p.kind in (inspect.Parameter.VAR_POSITIONAL,
                      inspect.Parameter.VAR_KEYWORD):
            continue
        default = None if p.default is inspect.Parameter.empty else p.default
        ann = (None if p.annotation is inspect.Parameter.empty
               else p.annotation)
        if isinstance(default, bool):
            kind = "bool"
        elif isinstance(default, int):
            kind = "int"
        elif isinstance(default, float):
            kind = "float"
        elif isinstance(default, str):
            kind = "str"
        else:
            kind = "object"
        schema[p.name] = {"default": default, "annotation": ann,
                          "kind": kind}
    return schema


def default_settings(display_name: str) -> dict:
    """The kwargs dict the panel starts from: every schema default that is
    JSON-representable (None means 'leave to the class')."""
    return {k: v["default"] for k, v in
            settings_schema(display_name).items()
            if isinstance(v["default"], (bool, int, float, str))}
