"""Launch the PySide6 GUI (reference `optiland_gui/`): dockable lens
editor, analysis/optimization panels, embedded 2D/3D viewer, python
terminal, command palette (Ctrl+Shift+P).

Requires a display + PySide6; the services layer underneath
(`optiland_tpu_gui.services`) is fully usable headless — see
tests/test_gui_services.py."""

from optiland_tpu_gui.connector import OptilandConnector
from optiland_tpu_gui.main_window import MainWindow


def main(show: bool = True):
    from optiland_tpu.models import CookeTriplet

    window = MainWindow(OptilandConnector())
    window.connector.set_optic(CookeTriplet())
    print("services ready:",
          f"{window.surface_service.get_surface_count()} surfaces,",
          f"{len(window.analysis_runner.available_analyses())} analyses,",
          f"{len(window.palette.commands())} palette commands")
    if show:  # pragma: no cover - needs a display
        from PySide6 import QtWidgets

        app = QtWidgets.QApplication.instance() or QtWidgets.QApplication([])
        window.show()
        app.exec()
    return window


if __name__ == "__main__":
    main()
