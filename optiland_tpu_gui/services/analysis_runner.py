"""Analysis registry + runner (reference
`optiland_gui/services/analysis_runner.py:1-102` and the analysis panel's
plugin registry `optiland_gui/registry.py`): maps display names to analysis
constructors and runs them against the connector's current Optic."""

from __future__ import annotations


def _registry() -> dict:
    import optiland_tpu.analysis as A
    from optiland_tpu.mtf import FFTMTF, GeometricMTF
    from optiland_tpu.psf import FFTPSF
    from optiland_tpu.wavefront import OPD

    return {
        "Spot Diagram": A.SpotDiagram,
        "Ray Fan": A.RayFan,
        "Distortion": A.Distortion,
        "Grid Distortion": A.GridDistortion,
        "Field Curvature": A.FieldCurvature,
        "RMS Spot Size vs Field": A.RmsSpotSizeVsField,
        "RMS Wavefront Error vs Field": A.RmsWavefrontErrorVsField,
        "Encircled Energy": A.EncircledEnergy,
        "Y-Ybar": A.YYbar,
        "Through-Focus Spot Diagram": A.ThroughFocusSpotDiagram,
        "Pupil Aberration": A.PupilAberration,
        "Angle vs Height": A.AngleVsHeight,
        "Incoherent Irradiance": A.IncoherentIrradiance,
        "OPD": OPD,
        "FFT PSF": FFTPSF,
        "FFT MTF": FFTMTF,
        "Geometric MTF": GeometricMTF,
    }


class AnalysisRunner:
    def __init__(self, connector):
        self.connector = connector
        self.registry = _registry()

    def available_analyses(self) -> list[str]:
        return sorted(self.registry)

    def run(self, name: str, **kwargs):
        """Instantiate the analysis on the current system; returns the
        analysis object (each exposes `.view()` for the panel's canvas)."""
        cls = self.registry[name]
        return cls(self.connector.get_optic(), **kwargs)

    def view(self, name: str, **kwargs):
        """Run + render onto a matplotlib figure (Agg-safe)."""
        obj = self.run(name, **kwargs)
        return obj.view()
