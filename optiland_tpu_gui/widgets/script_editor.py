"""Script editor dock (reference `optiland_gui/widgets/python_terminal.py`
editor half: tabbed editors, run-in-kernel, save/load, snippet insertion,
and a regex syntax highlighter). The console half lives in
`terminal.make_terminal_widget`; both share the same
`PythonTerminalService` kernel so scripts and the interactive console see
one namespace bound to the live optic."""

from __future__ import annotations

import keyword
import re

from PySide6 import QtWidgets

from optiland_tpu_gui.terminal import SNIPPETS

_THEME = {
    "keyword": "#c678dd",
    "string": "#98c379",
    "comment": "#5c6370",
    "number": "#d19a66",
}


class PythonHighlightRules:
    """Regex highlight rules (Qt-free so they are testable headless; the
    reference's QSyntaxHighlighter subclass needs a real Qt)."""

    def __init__(self, colors: dict | None = None):
        colors = colors or _THEME
        kw = r"\b(" + "|".join(keyword.kwlist) + r")\b"
        self.rules = [
            ("keyword", re.compile(kw), colors["keyword"]),
            ("string", re.compile(r"(['\"])(?:(?!\1).)*\1"),
             colors["string"]),
            ("comment", re.compile(r"#[^\n]*"), colors["comment"]),
            ("number", re.compile(r"\b\d+(\.\d+)?([eE][+-]?\d+)?\b"),
             colors["number"]),
        ]

    def spans(self, text: str):
        """[(kind, start, end, color)] for one line; later rules win on
        overlap (comments mask keywords inside them, like the reference's
        rule ordering)."""
        out = []
        for kind, rx, color in self.rules:
            for m in rx.finditer(text):
                out.append((kind, m.start(), m.end(), color))
        # comment spans suppress overlapping earlier spans
        comments = [(s, e) for k, s, e, _ in out if k == "comment"]
        if comments:
            out = [sp for sp in out
                   if sp[0] == "comment"
                   or not any(s <= sp[1] < e for s, e in comments)]
        return out


class ScriptEditor(QtWidgets.QWidget):
    """Tabbed script editor bound to the terminal service."""

    def __init__(self, terminal_service, parent=None):
        super().__init__(parent)
        self.service = terminal_service
        self.highlighter = PythonHighlightRules()
        lay = QtWidgets.QVBoxLayout(self)

        bar = QtWidgets.QHBoxLayout()
        for label, slot in (("New", self.new_tab), ("Open...", self._open),
                            ("Save...", self._save), ("Run", self.run)):
            btn = QtWidgets.QPushButton(label)
            btn.clicked.connect(slot)
            bar.addWidget(btn)
        self.snippets = QtWidgets.QComboBox()
        self.snippets.addItem("Insert snippet...")
        for name in SNIPPETS:
            self.snippets.addItem(name)
        self.snippets.currentIndexChanged.connect(self._insert_snippet)
        bar.addWidget(self.snippets)
        bar.addStretch(1)
        lay.addLayout(bar)

        self.tabs = QtWidgets.QTabWidget()
        lay.addWidget(self.tabs, 1)
        self.output = QtWidgets.QPlainTextEdit()
        self.output.setReadOnly(True)
        self.output.setMaximumHeight(90)
        lay.addWidget(self.output)
        self._paths: dict[int, str | None] = {}
        self.new_tab()

    # -- tab management ----------------------------------------------------
    def new_tab(self, title: str = "untitled"):
        editor = QtWidgets.QPlainTextEdit()
        idx = self.tabs.addTab(editor, title)
        self.tabs.setCurrentIndex(idx)
        self._paths[idx] = None
        return editor

    def current_editor(self):
        return self.tabs.widget(self.tabs.currentIndex())

    # -- actions -------------------------------------------------------------
    def run(self):
        """Execute the current tab in the shared console namespace."""
        src = self.current_editor().toPlainText()
        out = ""
        for line in self._as_console_lines(src):
            text, _more = self.service.execute(line)
            out += text
        if out:
            self.output.appendPlainText(out.rstrip("\n"))
        return out

    @staticmethod
    def _as_console_lines(src: str):
        """Feed whole blocks (a compile-and-exec unit) rather than line by
        line — the service's InteractiveConsole handles continuation."""
        return [src + "\n"] if src.strip() else []

    def _open(self):
        path, _ = QtWidgets.QFileDialog.getOpenFileName(
            self, "Open script", "", "Python (*.py)")
        if path:
            self.open_path(path)

    def open_path(self, path: str):
        with open(path) as fh:
            text = fh.read()
        editor = self.new_tab(title=path.rsplit("/", 1)[-1])
        editor.setPlainText(text)
        self._paths[self.tabs.currentIndex()] = path
        return editor

    def _save(self):
        idx = self.tabs.currentIndex()
        path = self._paths.get(idx)
        if not path:
            path, _ = QtWidgets.QFileDialog.getSaveFileName(
                self, "Save script", "", "Python (*.py)")
        if path:
            self.save_path(path)

    def save_path(self, path: str):
        with open(path, "w") as fh:
            fh.write(self.current_editor().toPlainText())
        self._paths[self.tabs.currentIndex()] = path
        return path

    def _insert_snippet(self, idx: int):
        if idx > 0:
            name = self.snippets.itemText(idx)
            ed = self.current_editor()
            cur = ed.toPlainText()
            ed.setPlainText((cur + "\n" if cur else "") + SNIPPETS[name])
            self.snippets.setCurrentIndex(0)
