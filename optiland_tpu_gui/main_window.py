"""PySide6 main window (reference `optiland_gui/main_window.py:1` — menu
bar, dockable lens editor / analysis / optimization / viewer panels,
undo/redo actions). All Qt imports are function-local so the services layer
stays importable without PySide6."""

from __future__ import annotations

from optiland_tpu_gui.connector import OptilandConnector
from optiland_tpu_gui.services import (
    AnalysisRunner,
    FileService,
    OptimizationService,
    SurfaceService,
    SystemService,
)


def require_qt():
    try:
        from PySide6 import QtWidgets  # noqa: F401
    except Exception as e:  # pragma: no cover - exercised only without Qt
        raise ImportError(
            "PySide6 is required for the optiland_tpu GUI widgets; the "
            "services layer works without it."
        ) from e


class MainWindow:
    """Thin composition root: builds the services and the Qt widgets.

    Separated from QMainWindow so construction logic is testable headless
    (`build_services` has no Qt dependency)."""

    def __init__(self, connector: OptilandConnector | None = None):
        self.connector = connector or OptilandConnector()
        (self.surface_service, self.system_service, self.file_service,
         self.analysis_runner, self.optimization_service) = (
             self.build_services(self.connector))
        self._qt = None

    @staticmethod
    def build_services(connector):
        return (
            SurfaceService(connector),
            SystemService(connector),
            FileService(connector),
            AnalysisRunner(connector),
            OptimizationService(connector),
        )

    # -- Qt side ---------------------------------------------------------
    def show(self):  # pragma: no cover - needs a display
        require_qt()
        from PySide6 import QtWidgets

        from optiland_tpu_gui.widgets import (
            AnalysisPanel,
            LensEditor,
            OptimizationPanel,
            ViewerPanel,
        )

        win = QtWidgets.QMainWindow()
        win.setWindowTitle("optiland_tpu")
        tabs = QtWidgets.QTabWidget()
        tabs.addTab(LensEditor(self.surface_service), "Lens Editor")
        tabs.addTab(AnalysisPanel(self.analysis_runner), "Analysis")
        tabs.addTab(OptimizationPanel(self.optimization_service),
                    "Optimization")
        tabs.addTab(ViewerPanel(self.connector), "Viewer")
        win.setCentralWidget(tabs)

        menu = win.menuBar().addMenu("&File")
        menu.addAction("New", self.file_service.new_system)
        menu.addAction("Open...", self._open_dialog)
        menu.addAction("Save", lambda: self.file_service.save())
        edit = win.menuBar().addMenu("&Edit")
        edit.addAction("Undo", self.connector.undo)
        edit.addAction("Redo", self.connector.redo)
        self._qt = win
        win.show()
        return win

    def _open_dialog(self):  # pragma: no cover - needs a display
        from PySide6 import QtWidgets

        path, _ = QtWidgets.QFileDialog.getOpenFileName(
            self._qt, "Open system", "",
            "Optical systems (*.json *.zmx *.seq)")
        if path:
            self.file_service.open(path)
