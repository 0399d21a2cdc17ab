"""GUI entry point (reference `optiland_gui/run_gui.py:1-65`; the
reference wires it to the `optiland` console script in pyproject)."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from optiland_tpu_gui.main_window import MainWindow, require_qt

    require_qt()
    from PySide6 import QtWidgets

    app = QtWidgets.QApplication(argv or sys.argv)
    window = MainWindow()
    if len(sys.argv) > 1:
        window.file_service.open(sys.argv[1])
    window.show()
    return app.exec()


if __name__ == "__main__":
    raise SystemExit(main())
