"""Analysis panel (reference `optiland_gui/analysis_panel.py:1-1664`):
category-grouped analysis selector, dynamic settings form generated from
the registry's constructor schema, result-window pagination, save/load of
settings, and a log strip — all state lives in the headless
`AnalysisRunner`."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets
from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg


class AnalysisPanel(QtWidgets.QWidget):
    def __init__(self, runner):
        super().__init__()
        self.runner = runner
        outer = QtWidgets.QVBoxLayout(self)

        # -- top bar: grouped selector + run/settings buttons ------------
        top = QtWidgets.QHBoxLayout()
        self.selector = QtWidgets.QComboBox()
        self._populate_selector()
        self.selector.currentIndexChanged.connect(self._rebuild_settings)
        top.addWidget(self.selector, 1)
        self.btn_run = QtWidgets.QPushButton("Run")
        self.btn_run.clicked.connect(self.run_selected)
        top.addWidget(self.btn_run)
        self.btn_settings = QtWidgets.QPushButton("Settings")
        self.btn_settings.setCheckable(True)
        self.btn_settings.toggled.connect(
            lambda on: self.settings_box.setVisible(on))
        top.addWidget(self.btn_settings)
        outer.addLayout(top)

        # -- central: canvas + collapsible settings form ------------------
        center = QtWidgets.QHBoxLayout()
        self.canvas_holder = QtWidgets.QVBoxLayout()
        center.addLayout(self.canvas_holder, 1)
        self.settings_box = QtWidgets.QGroupBox("Analysis Settings")
        self.settings_form = QtWidgets.QFormLayout(self.settings_box)
        self.settings_box.setVisible(False)
        self._setting_widgets: dict[str, QtWidgets.QWidget] = {}
        srow = QtWidgets.QVBoxLayout()
        srow.addWidget(self.settings_box)
        save = QtWidgets.QPushButton("Save settings...")
        save.clicked.connect(self._save_settings)
        load = QtWidgets.QPushButton("Load settings...")
        load.clicked.connect(self._load_settings)
        srow.addWidget(save)
        srow.addWidget(load)
        srow.addStretch(1)
        center.addLayout(srow)
        outer.addLayout(center, 1)

        # -- pagination over result windows -------------------------------
        nav = QtWidgets.QHBoxLayout()
        self.btn_prev = QtWidgets.QPushButton("<")
        self.btn_prev.clicked.connect(lambda: self._page(-1))
        self.btn_next = QtWidgets.QPushButton(">")
        self.btn_next.clicked.connect(lambda: self._page(+1))
        self.page_label = QtWidgets.QLabel("")
        self.btn_close = QtWidgets.QPushButton("Close window")
        self.btn_close.clicked.connect(self._close_current)
        nav.addWidget(self.btn_prev)
        nav.addWidget(self.page_label, 1, QtCore.Qt.AlignCenter)
        nav.addWidget(self.btn_next)
        nav.addWidget(self.btn_close)
        outer.addLayout(nav)

        # -- log strip ----------------------------------------------------
        self.log = QtWidgets.QPlainTextEdit()
        self.log.setReadOnly(True)
        self.log.setMaximumHeight(60)
        outer.addWidget(self.log)

        self._rebuild_settings()

    # -- selector ---------------------------------------------------------
    def _populate_selector(self):
        """Category headers are non-selectable separators, as in the
        reference's `_populate_analysis_combo`."""
        model = self.selector.model()
        for cat in self.runner.categories():
            self.selector.addItem(f"— {cat} —")
            item = model.item(self.selector.count() - 1)
            item.setFlags(item.flags() & ~QtCore.Qt.ItemIsSelectable
                          & ~QtCore.Qt.ItemIsEnabled)
            for name in self.runner.analyses_in(cat):
                self.selector.addItem(name)

    def current_analysis(self) -> str | None:
        text = self.selector.currentText()
        return None if text.startswith("—") else text

    # -- dynamic settings form -------------------------------------------
    def _rebuild_settings(self):
        while self.settings_form.rowCount():
            self.settings_form.removeRow(0)
        self._setting_widgets.clear()
        name = self.current_analysis()
        if name is None:
            return
        for key, meta in self.runner.settings_schema(name).items():
            w = self._widget_for(meta)
            self._setting_widgets[key] = w
            self.settings_form.addRow(key, w)

    @staticmethod
    def _widget_for(meta: dict) -> QtWidgets.QWidget:
        kind, default = meta["kind"], meta["default"]
        if kind == "bool":
            w = QtWidgets.QCheckBox()
            w.setChecked(bool(default))
        elif kind == "int":
            w = QtWidgets.QSpinBox()
            w.setRange(-(10**6), 10**6)
            w.setValue(int(default))
        elif kind == "float":
            w = QtWidgets.QDoubleSpinBox()
            w.setRange(-1e12, 1e12)
            w.setDecimals(6)
            w.setValue(float(default))
        else:
            w = QtWidgets.QLineEdit("" if default is None else str(default))
        return w

    def gather_settings(self) -> dict:
        out: dict = {}
        for key, w in self._setting_widgets.items():
            if isinstance(w, QtWidgets.QCheckBox):
                out[key] = w.isChecked()
            elif isinstance(w, (QtWidgets.QSpinBox,
                                QtWidgets.QDoubleSpinBox)):
                out[key] = w.value()
            else:
                text = w.text().strip()
                if text:
                    out[key] = text
        return out

    # -- running / display -----------------------------------------------
    def run_selected(self):
        name = self.current_analysis()
        if name is None:
            return
        try:
            self.runner.run(name, **self.gather_settings())
        except Exception as exc:
            self.log.appendPlainText(f"ERROR: {exc}")
            return
        self._show_current()
        self.log.setPlainText("\n".join(self.runner.log[-5:]))

    def _show_current(self):
        while self.canvas_holder.count():
            w = self.canvas_holder.takeAt(0).widget()
            if w:
                w.deleteLater()
        win = self.runner.current
        if win is None:
            self.page_label.setText("no results")
            return
        out = win.result.view()
        fig = out[0] if isinstance(out, tuple) else out
        self.canvas_holder.addWidget(FigureCanvasQTAgg(fig))
        self.page_label.setText(
            f"{win.title}  ({self.runner.current_index + 1}"
            f"/{len(self.runner.windows)})")

    def _page(self, step: int):
        n = len(self.runner.windows)
        if not n:
            return
        self.runner.select((self.runner.current_index + step) % n)
        self._show_current()

    def _close_current(self):
        if self.runner.current is not None:
            self.runner.close_window(self.runner.current_index)
            self._show_current()

    # -- settings persistence --------------------------------------------
    def _save_settings(self):
        if self.runner.current is None:
            return
        path, _ = QtWidgets.QFileDialog.getSaveFileName(
            self, "Save analysis settings", "", "JSON (*.json)")
        if path:
            self.runner.save_settings(path)

    def _load_settings(self):
        path, _ = QtWidgets.QFileDialog.getOpenFileName(
            self, "Load analysis settings", "", "JSON (*.json)")
        if not path:
            return
        name, settings = self.runner.load_settings(path)
        idx = self.selector.findText(name)
        if idx >= 0:
            self.selector.setCurrentIndex(idx)
        self._rebuild_settings()
        for key, val in settings.items():
            w = self._setting_widgets.get(key)
            if isinstance(w, QtWidgets.QCheckBox):
                w.setChecked(bool(val))
            elif isinstance(w, (QtWidgets.QSpinBox,
                                QtWidgets.QDoubleSpinBox)):
                w.setValue(val)
            elif w is not None:
                w.setText(str(val))
