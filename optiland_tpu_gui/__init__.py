"""optiland_tpu GUI (reference `optiland_gui/`, 12.6k LoC PySide6 app).

Architecture mirrors the reference: a Qt-free CONNECTOR + SERVICES layer
(`optiland_gui/optiland_connector.py`, `optiland_gui/services/`) that owns
the live `Optic`, undo/redo, the lens-editor spreadsheet semantics, the
analysis registry and the optimization workflow — all fully testable
headless — plus thin PySide6 widgets (`main_window`, `lens_editor`,
`analysis_panel`, `optimization_panel`, `viewer_panel`) that bind to the
services and are import-gated so the package works on machines without Qt.
"""

from optiland_tpu_gui.connector import OptilandConnector
from optiland_tpu_gui.undo_redo import UndoRedoManager

__all__ = ["OptilandConnector", "UndoRedoManager", "qt_available"]


def qt_available() -> bool:
    """Whether PySide6 can be imported (the widget layer needs it)."""
    try:
        import PySide6  # noqa: F401

        return True
    except Exception:
        return False
