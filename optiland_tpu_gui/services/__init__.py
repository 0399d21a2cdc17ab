"""Headless service layer (reference `optiland_gui/services/__init__.py`)."""

from optiland_tpu_gui.services.analysis_runner import AnalysisRunner
from optiland_tpu_gui.services.file_service import FileService
from optiland_tpu_gui.services.optimization_service import OptimizationService
from optiland_tpu_gui.services.surface_service import SurfaceService
from optiland_tpu_gui.services.system_service import SystemService
from optiland_tpu_gui.services.viewer_service import ViewerService

__all__ = [
    "AnalysisRunner",
    "FileService",
    "OptimizationService",
    "SurfaceService",
    "SystemService",
    "ViewerService",
]
