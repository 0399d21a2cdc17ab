"""Qt widget layer binding the headless services (reference
`optiland_gui/widgets/` + the top-level panel modules). Importable only
with PySide6 installed; every behavior lives in the services and is covered
by the headless tests (`tests/test_gui_services.py`,
`tests/test_gui_depth.py`)."""

from optiland_tpu_gui.widgets.analysis_panel import AnalysisPanel
from optiland_tpu_gui.widgets.command_palette import CommandPaletteDialog
from optiland_tpu_gui.widgets.frameless_window import (
    CustomDockTitleBar,
    CustomDockWidget,
    CustomTitleBar,
    FramelessWindow,
)
from optiland_tpu_gui.widgets.lens_editor import LensEditor, LensTableModel
from optiland_tpu_gui.widgets.optimization_panel import OptimizationPanel
from optiland_tpu_gui.widgets.script_editor import (PythonHighlightRules,
                                                    ScriptEditor)
from optiland_tpu_gui.widgets.settings_dialog import SettingsDialog
from optiland_tpu_gui.widgets.sidebar import Sidebar
from optiland_tpu_gui.widgets.system_properties_panel import (
    SystemPropertiesPanel,
)
from optiland_tpu_gui.widgets.toast import ToastOverlay
from optiland_tpu_gui.widgets.viewer_panel import SagViewerPanel, ViewerPanel

__all__ = [
    "PythonHighlightRules",
    "ScriptEditor",
    "SettingsDialog",
    "AnalysisPanel",
    "CommandPaletteDialog",
    "CustomDockTitleBar",
    "CustomDockWidget",
    "CustomTitleBar",
    "FramelessWindow",
    "LensEditor",
    "LensTableModel",
    "OptimizationPanel",
    "SagViewerPanel",
    "Sidebar",
    "SystemPropertiesPanel",
    "ToastOverlay",
    "ViewerPanel",
]
