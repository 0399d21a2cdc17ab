"""PySide6 main window (reference `optiland_gui/main_window.py:1` — menu
bar, dockable lens editor / analysis / optimization / viewer panels, system
properties, python terminal, themes, undo/redo actions). All Qt imports are
function-local so the services layer stays importable without PySide6."""

from __future__ import annotations

from optiland_tpu_gui.actions import default_actions
from optiland_tpu_gui.command_palette import CommandPalette
from optiland_tpu_gui.connector import OptilandConnector
from optiland_tpu_gui.logging_handler import install as install_log_handler
from optiland_tpu_gui.panels import PanelManager
from optiland_tpu_gui.services import (
    AnalysisRunner,
    FileService,
    OptimizationService,
    SurfaceService,
    SystemService,
    ViewerService,
)
from optiland_tpu_gui.settings import GuiConfig, stylesheet
from optiland_tpu_gui.terminal import PythonTerminalService
from optiland_tpu_gui.toast import ToastManager


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
    (`build_services` and the action/terminal/config layers have no Qt
    dependency)."""

    def __init__(self, connector: OptilandConnector | None = None,
                 config: GuiConfig | None = None):
        self.connector = connector or OptilandConnector()
        self.config = config or GuiConfig()
        (self.surface_service, self.system_service, self.file_service,
         self.analysis_runner, self.optimization_service,
         self.viewer_service) = self.build_services(self.connector)
        self.terminal = PythonTerminalService(self.connector)
        self.actions = default_actions(self)
        self._register_extra_actions()
        self.panels = PanelManager(config=self.config)
        self.toasts = ToastManager()
        self.log_handler = install_log_handler()
        self.palette = self._build_palette()
        # surface async-optimization outcomes as toasts (reference main
        # window status-bar/toast notifications)
        self.optimization_service.finished.connect(
            lambda result: self.toasts.success("Optimization finished"))
        self.optimization_service.failed.connect(
            lambda exc: self.toasts.error(f"Optimization failed: {exc}"))
        self._qt = None

    @staticmethod
    def build_services(connector):
        return (
            SurfaceService(connector),
            SystemService(connector),
            FileService(connector),
            AnalysisRunner(connector),
            OptimizationService(connector),
            ViewerService(connector),
        )

    def _build_palette(self) -> CommandPalette:
        """Every registered action is reachable from the command palette
        (reference `command_palette.py` builds its list the same way)."""
        palette = CommandPalette()
        for name in self.actions.names():
            a = self.actions.get(name)
            palette.register(
                a.name, a.label.replace("&", ""),
                lambda n=a.name: self.actions.trigger(n),
                category=(a.menu or "").replace("&", ""),
                shortcut=a.shortcut or "",
                enabled=lambda n=a.name: self.actions.get(n).enabled)
        for panel in self.panels.names():
            palette.register(
                f"panel.toggle.{panel}", f"Toggle panel: {panel}",
                lambda p=panel: self.panels.toggle(p), category="View")
        for analysis in self.analysis_runner.available_analyses():
            palette.register(
                f"analysis.run.{analysis}", f"Run analysis: {analysis}",
                lambda a=analysis: self.analysis_runner.run(a),
                category="Analysis")
        return palette

    def _register_extra_actions(self):
        from optiland_tpu_gui.settings import THEMES

        for name in THEMES:
            self.actions.register(
                f"view.theme.{name}", f"Theme: {name}",
                lambda n=name: self.set_theme(n), menu="&View")
        self.actions.register("app.settings", "&Settings...",
                              self.open_settings, menu="&Edit")

    # -- config-backed behaviors (headless-testable) ---------------------
    def set_theme(self, name: str) -> None:
        self.config.theme = name
        if self._qt is not None:  # pragma: no cover - needs a display
            self._qt.setStyleSheet(stylesheet(name))

    def open_file(self, path: str) -> None:
        self.file_service.open(path)
        self.config.add_recent_file(path)

    def open_settings(self):
        """Open the settings dialog (widget layer; works under the Qt
        shim in headless tests)."""
        from optiland_tpu_gui.widgets import SettingsDialog

        dlg = SettingsDialog(self, self._qt)
        dlg.exec()
        return dlg

    # -- Qt side ---------------------------------------------------------
    def show(self):  # pragma: no cover - needs a display
        require_qt()
        from PySide6 import QtCore, QtGui, QtWidgets

        from optiland_tpu_gui.terminal import make_terminal_widget
        from optiland_tpu_gui.widgets import (
            AnalysisPanel,
            CommandPaletteDialog,
            CustomDockWidget,
            LensEditor,
            OptimizationPanel,
            SagViewerPanel,
            ScriptEditor,
            Sidebar,
            SystemPropertiesPanel,
            ToastOverlay,
            ViewerPanel,
        )

        win = QtWidgets.QMainWindow()
        win.setWindowTitle("optiland_tpu")
        win.setStyleSheet(stylesheet(self.config.theme))

        panel_widgets = {
            "lens_editor": ("Lens Editor", "LDE",
                            LensEditor(self.surface_service)),
            "system_properties": ("System", "SYS",
                                  SystemPropertiesPanel(self.system_service)),
            "analysis": ("Analysis", "ANA",
                         AnalysisPanel(self.analysis_runner)),
            "optimization": ("Optimization", "OPT",
                             OptimizationPanel(self.optimization_service)),
            "viewer": ("Viewer", "2D", ViewerPanel(self.viewer_service)),
            "sag_viewer": ("Sag", "SAG", SagViewerPanel(self.viewer_service)),
            "console": ("Console", ">_", make_terminal_widget(self.terminal)),
            "script_editor": ("Scripts", "PY",
                              ScriptEditor(self.terminal)),
        }
        # sidebar + central stack for the primary panels, docks for the rest
        sidebar = Sidebar()
        stack = QtWidgets.QStackedWidget()
        stack_index: dict[str, int] = {}
        for name in self.panels.names():
            title, icon, widget = panel_widgets[name]
            if name in ("lens_editor", "analysis", "optimization", "viewer"):
                stack_index[name] = stack.addWidget(widget)
                sidebar.add_entry(name, icon)
            else:
                dock = CustomDockWidget(title, widget, panels=self.panels,
                                        panel_name=name)
                win.addDockWidget(QtCore.Qt.RightDockWidgetArea, dock)
        sidebar.panel_selected.connect(
            lambda n: stack.setCurrentIndex(stack_index[n]))
        central = QtWidgets.QWidget()
        hbox = QtWidgets.QHBoxLayout(central)
        hbox.setContentsMargins(0, 0, 0, 0)
        hbox.addWidget(sidebar)
        hbox.addWidget(stack, 1)
        win.setCentralWidget(central)
        sidebar.select("lens_editor")

        menus: dict[str, QtWidgets.QMenu] = {}
        for menu_name, actions in self.actions.by_menu().items():
            menu = menus.setdefault(
                menu_name, win.menuBar().addMenu(menu_name or "&Tools"))
            for a in actions:
                qa = QtGui.QAction(a.label, win)
                if a.shortcut:
                    qa.setShortcut(a.shortcut)
                qa.triggered.connect(a.callback)
                menu.addAction(qa)
        recent = menus.get("&File", win.menuBar().addMenu("&File")) \
            .addMenu("Open &Recent")
        for path in self.config.recent_files:
            recent.addAction(path, lambda p=path: self.open_file(p))

        # command palette on Ctrl+Shift+P (reference main_window shortcut)
        QtGui.QShortcut(
            QtGui.QKeySequence("Ctrl+Shift+P"), win,
            activated=lambda: CommandPaletteDialog(self.palette, win).exec())
        # toast overlay in the corner of the main window
        ToastOverlay(self.toasts, win)

        self._qt = win
        win.show()
        return win

    def _open_dialog(self):  # pragma: no cover - needs a display
        from PySide6 import QtWidgets

        path, _ = QtWidgets.QFileDialog.getOpenFileName(
            self._qt, "Open system", "",
            "Optical systems (*.json *.zmx *.seq)")
        if path:
            self.open_file(path)
