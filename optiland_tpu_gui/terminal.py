"""Embedded Python terminal (reference `optiland_gui/python_terminal.py`):
an interactive console scoped to the live optical system. The service layer
(`PythonTerminalService`) is Qt-free and fully testable headless; the Qt
widget is a thin view over it."""

from __future__ import annotations

import code
import contextlib
import io
import traceback


class PythonTerminalService:
    """InteractiveConsole over the connector's live Optic.

    The namespace exposes `optic` (live object — rebound on every access so
    undo/redo/open swaps are visible), `connector`, `np`, `jnp` and the
    `optiland_tpu` package, mirroring the reference terminal's bindings to
    the active system."""

    BANNER = ("optiland_tpu console — `optic` is the live system, "
              "`connector` the GUI connector")

    def __init__(self, connector):
        self.connector = connector
        self._ns: dict = {"connector": connector}
        self._console = code.InteractiveConsole(self._ns)
        self.history: list[str] = []

    def _refresh_ns(self):
        import numpy as np

        self._ns["optic"] = self.connector.get_optic()
        self._ns["np"] = np
        try:
            import jax.numpy as jnp

            self._ns["jnp"] = jnp
        except Exception:  # pragma: no cover - jax is a hard dep in practice
            pass
        import optiland_tpu

        self._ns["optiland_tpu"] = optiland_tpu

    def execute(self, source: str) -> tuple[str, bool]:
        """Run one console input. Returns (captured output, needs_more) —
        `needs_more` mirrors InteractiveConsole.push (open block)."""
        self._refresh_ns()
        self.history.append(source)
        buf = io.StringIO()
        needs_more = False
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            try:
                needs_more = self._console.push(source)
            except SystemExit:
                buf.write("SystemExit ignored (terminal stays open)\n")
            except BaseException:  # defensive: console.push shouldn't raise
                traceback.print_exc(file=buf)
        return buf.getvalue(), bool(needs_more)

    def reset(self):
        self._ns = {"connector": self.connector}
        self._console = code.InteractiveConsole(self._ns)
        self.history.clear()


def make_terminal_widget(service):  # pragma: no cover - needs a display
    """Qt widget over the service: output pane + input line."""
    from PySide6 import QtWidgets

    w = QtWidgets.QWidget()
    lay = QtWidgets.QVBoxLayout(w)
    out = QtWidgets.QPlainTextEdit()
    out.setReadOnly(True)
    out.appendPlainText(service.BANNER)
    line = QtWidgets.QLineEdit()
    line.setPlaceholderText(">>> ")

    def run():
        src = line.text()
        line.clear()
        out.appendPlainText(">>> " + src)
        text, more = service.execute(src)
        if text:
            out.appendPlainText(text.rstrip("\n"))
        line.setPlaceholderText("... " if more else ">>> ")

    line.returnPressed.connect(run)
    lay.addWidget(out)
    lay.addWidget(line)
    w.output = out
    w.input = line
    return w
