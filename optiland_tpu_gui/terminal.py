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
        self._hist_cursor = None

    # -- history navigation (reference `python_terminal.py` up/down keys) --
    def history_prev(self) -> str | None:
        """Step backward through input history (Up key)."""
        if not self.history:
            return None
        cur = getattr(self, "_hist_cursor", None)
        self._hist_cursor = (len(self.history) - 1 if cur is None
                             else max(cur - 1, 0))
        return self.history[self._hist_cursor]

    def history_next(self) -> str | None:
        """Step forward through input history (Down key); None past the
        newest entry (the widget clears the input line)."""
        cur = getattr(self, "_hist_cursor", None)
        if cur is None:
            return None
        if cur >= len(self.history) - 1:
            self._hist_cursor = None
            return None
        self._hist_cursor = cur + 1
        return self.history[self._hist_cursor]

    def reset_history_cursor(self) -> None:
        self._hist_cursor = None

    # -- tab completion (reference terminal jedi/rlcompleter completion) ---
    def complete(self, text: str) -> list[str]:
        """Completions for the trailing identifier of `text` against the
        live namespace (rlcompleter semantics: names and attributes)."""
        import re
        import rlcompleter

        self._refresh_ns()
        m = re.search(r"[\w.]+$", text)
        frag = m.group(0) if m else ""
        if not frag:
            return []
        comp = rlcompleter.Completer(self._ns)
        out = []
        i = 0
        while True:
            c = comp.complete(frag, i)
            if c is None:
                break
            out.append(c)
            i += 1
        seen = set()
        return [c for c in out if not (c in seen or seen.add(c))]

    def run_script(self, path: str) -> str:
        """Execute a script file in the console namespace (the reference
        terminal's editor-dock Run action)."""
        with open(path) as fh:
            src = fh.read()
        self._refresh_ns()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            try:
                exec(compile(src, path, "exec"), self._ns)
            except BaseException:
                traceback.print_exc(file=buf)
        return buf.getvalue()


# named snippets surfaced in the terminal widget (reference
# `python_terminal.py` snippets sidebar)
SNIPPETS: dict[str, str] = {
    "trace on-axis": "hist = optic.trace(Hx=0.0, Hy=0.0, num_rays=32)",
    "first-order report": "print(float(optic.paraxial.f2()), "
                          "float(optic.paraxial.FNO()))",
    "spot diagram": ("from optiland_tpu.analysis import SpotDiagram\n"
                     "SpotDiagram(optic).view()"),
    "save system": ("from optiland_tpu.fileio import save_optiland_file\n"
                    "save_optiland_file(optic, 'system.json')"),
}


def make_terminal_widget(service):
    """Qt widget over the service: output pane + input line with history
    navigation (Up/Down), Tab completion, snippet buttons, and a clear
    action (compact rebuild of the reference's `python_terminal.py`
    features on the headless service)."""
    from PySide6 import QtCore, QtWidgets

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
        service.reset_history_cursor()
        out.appendPlainText(">>> " + src)
        text, more = service.execute(src)
        if text:
            out.appendPlainText(text.rstrip("\n"))
        line.setPlaceholderText("... " if more else ">>> ")

    line.returnPressed.connect(run)

    class _KeyFilter(QtCore.QObject):
        def eventFilter(self, obj, event):
            if event.type() != QtCore.QEvent.KeyPress:
                return False
            key = event.key()
            if key == QtCore.Qt.Key_Up:
                prev = service.history_prev()
                if prev is not None:
                    line.setText(prev)
                return True
            if key == QtCore.Qt.Key_Down:
                nxt = service.history_next()
                line.setText(nxt if nxt is not None else "")
                return True
            if key == QtCore.Qt.Key_Tab:
                comps = service.complete(line.text())
                if len(comps) == 1:
                    import re

                    line.setText(re.sub(r"[\w.]+$", comps[0], line.text()))
                elif comps:
                    out.appendPlainText("  ".join(comps[:20]))
                return True
            return False

    filt = _KeyFilter(w)
    line.installEventFilter(filt)
    w._key_filter = filt

    bar = QtWidgets.QHBoxLayout()
    clear = QtWidgets.QPushButton("Clear")
    clear.clicked.connect(out.clear)
    bar.addWidget(clear)
    snip_combo = QtWidgets.QComboBox()
    snip_combo.addItem("Snippets...")
    for name in SNIPPETS:
        snip_combo.addItem(name)

    def insert_snippet(idx):
        if idx > 0:
            line.setText(SNIPPETS[snip_combo.itemText(idx)])
            snip_combo.setCurrentIndex(0)

    snip_combo.currentIndexChanged.connect(insert_snippet)
    bar.addWidget(snip_combo)
    bar.addStretch(1)

    lay.addWidget(out)
    lay.addWidget(line)
    lay.addLayout(bar)
    w.output = out
    w.input = line
    w.key_filter = filt
    return w
