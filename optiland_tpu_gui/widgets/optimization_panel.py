"""Optimization panel (reference
`optiland_gui/optimization_panel.py:1-1257`): operand and variable tables
with per-type metadata-driven editors, grouped optimizer selector with
per-method settings, asynchronous Run/Stop with live merit plot — all
state lives in the headless `OptimizationService`."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets
from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
from matplotlib.figure import Figure


class _RowsModel(QtCore.QAbstractTableModel):
    """Shared list-of-rows model for the operand and variable tables."""

    def __init__(self, headers, get_rows):
        super().__init__()
        self.headers = headers
        self.get_rows = get_rows

    def rowCount(self, parent=None):
        return len(self.get_rows())

    def columnCount(self, parent=None):
        return len(self.headers)

    def headerData(self, section, orientation, role):
        if (role == QtCore.Qt.DisplayRole
                and orientation == QtCore.Qt.Horizontal):
            return self.headers[section]
        return None

    def data(self, index, role):
        if role != QtCore.Qt.DisplayRole:
            return None
        row = self.get_rows()[index.row()]
        return str(row[index.column()])

    def refresh(self):
        self.layoutChanged.emit()


class OperandDialog(QtWidgets.QDialog):
    """Add/edit one operand row from its metadata (reference operand
    editor dialog)."""

    def __init__(self, service, parent=None):
        super().__init__(parent)
        self.service = service
        self.setWindowTitle("Operand")
        form = QtWidgets.QFormLayout(self)
        self.op_type = QtWidgets.QComboBox()
        self.op_type.addItems(service.available_operand_types())
        self.op_type.currentTextChanged.connect(self._rebuild)
        form.addRow("Type", self.op_type)
        self.target = QtWidgets.QLineEdit("0.0")
        form.addRow("Target", self.target)
        self.weight = QtWidgets.QLineEdit("1.0")
        form.addRow("Weight", self.weight)
        self.inputs_box = QtWidgets.QGroupBox("Inputs")
        self.inputs_form = QtWidgets.QFormLayout(self.inputs_box)
        form.addRow(self.inputs_box)
        self._input_edits: dict[str, QtWidgets.QLineEdit] = {}
        buttons = QtWidgets.QDialogButtonBox(
            QtWidgets.QDialogButtonBox.Ok | QtWidgets.QDialogButtonBox.Cancel)
        buttons.accepted.connect(self._apply)
        buttons.rejected.connect(self.reject)
        form.addRow(buttons)
        self._rebuild(self.op_type.currentText())

    def _rebuild(self, op_type: str):
        while self.inputs_form.rowCount():
            self.inputs_form.removeRow(0)
        self._input_edits.clear()
        for key, val in self.service.get_default_input_data(op_type).items():
            edit = QtWidgets.QLineEdit(str(val))
            self._input_edits[key] = edit
            self.inputs_form.addRow(key, edit)

    def _apply(self):
        op_type = self.op_type.currentText()
        input_data = {}
        for key, edit in self._input_edits.items():
            text = edit.text().strip()
            try:
                input_data[key] = float(text)
            except ValueError:
                input_data[key] = text
        err = self.service.validate_operand_input_data(op_type, input_data)
        if err:
            QtWidgets.QMessageBox.warning(self, "Invalid operand", err)
            return
        self.service.add_operand(
            op_type, target=float(self.target.text() or 0.0),
            weight=float(self.weight.text() or 1.0), **input_data)
        self.accept()


class VariableDialog(QtWidgets.QDialog):
    def __init__(self, service, parent=None):
        super().__init__(parent)
        self.service = service
        self.setWindowTitle("Variable")
        form = QtWidgets.QFormLayout(self)
        self.var_type = QtWidgets.QComboBox()
        self.var_type.addItems(service.available_variable_types())
        form.addRow("Type", self.var_type)
        self.surface = QtWidgets.QSpinBox()
        self.surface.setRange(0, 999)
        self.surface.setValue(1)
        form.addRow("Surface", self.surface)
        self.coeff = QtWidgets.QSpinBox()
        self.coeff.setRange(0, 999)
        form.addRow("Coefficient", self.coeff)
        self.min_val = QtWidgets.QLineEdit()
        form.addRow("Min", self.min_val)
        self.max_val = QtWidgets.QLineEdit()
        form.addRow("Max", self.max_val)
        buttons = QtWidgets.QDialogButtonBox(
            QtWidgets.QDialogButtonBox.Ok | QtWidgets.QDialogButtonBox.Cancel)
        buttons.accepted.connect(self._apply)
        buttons.rejected.connect(self.reject)
        form.addRow(buttons)

    def _apply(self):
        kwargs: dict = {"surface_number": self.surface.value()}
        meta = self.service.get_variable_metadata(self.var_type.currentText())
        if "coeff_number" in meta["fields"]:
            kwargs["coeff_number"] = self.coeff.value()
        for name, edit in (("min_val", self.min_val),
                           ("max_val", self.max_val)):
            text = edit.text().strip()
            if text:
                kwargs[name] = float(text)
        self.service.add_variable(self.var_type.currentText(), **kwargs)
        self.accept()


class OptimizationPanel(QtWidgets.QWidget):
    def __init__(self, service):
        super().__init__()
        self.service = service
        outer = QtWidgets.QVBoxLayout(self)

        # -- operand + variable tables -----------------------------------
        tables = QtWidgets.QHBoxLayout()
        self.operand_model = _RowsModel(
            ["Type", "Target", "Weight", "Value"],
            lambda: [(r.operand_type, r.target, r.weight,
                      self._fmt(self.service.get_operand_current_value(i)))
                     for i, r in enumerate(self.service.operands)])
        tables.addLayout(self._table_group(
            "Operands", self.operand_model, self._add_operand,
            lambda i: self.service.remove_operand(i)))
        self.variable_model = _RowsModel(
            ["Type", "Surface", "Value"],
            lambda: [(r.variable_type, r.kwargs.get("surface_number"),
                      self._fmt(self.service.get_variable_current_value(i)))
                     for i, r in enumerate(self.service.variables)])
        tables.addLayout(self._table_group(
            "Variables", self.variable_model, self._add_variable,
            lambda i: self.service.remove_variable(i)))
        outer.addLayout(tables, 1)

        # -- optimizer selector (grouped) + settings ----------------------
        runrow = QtWidgets.QHBoxLayout()
        self.optimizer = QtWidgets.QComboBox()
        model = self.optimizer.model()
        for group, names in self.service.get_optimizer_groups().items():
            self.optimizer.addItem(f"— {group} —")
            item = model.item(self.optimizer.count() - 1)
            item.setFlags(item.flags() & ~QtCore.Qt.ItemIsSelectable
                          & ~QtCore.Qt.ItemIsEnabled)
            for n in names:
                self.optimizer.addItem(n)
        self.optimizer.setCurrentText("generic")
        runrow.addWidget(self.optimizer, 1)
        self.btn_run = QtWidgets.QPushButton("Run")
        self.btn_run.clicked.connect(self._run)
        runrow.addWidget(self.btn_run)
        self.btn_stop = QtWidgets.QPushButton("Stop")
        self.btn_stop.clicked.connect(self.service.stop)
        self.btn_stop.setEnabled(False)
        runrow.addWidget(self.btn_stop)
        outer.addLayout(runrow)

        # -- merit plot + progress ----------------------------------------
        self.fig = Figure(figsize=(5, 2))
        self.ax = self.fig.add_subplot(111)
        self.canvas = FigureCanvasQTAgg(self.fig)
        outer.addWidget(self.canvas, 1)
        self.status = QtWidgets.QLabel("")
        outer.addWidget(self.status)

        # service signals fire on the worker thread; marshal to the GUI
        # thread with queued signal delivery
        self._bridge = _Bridge()
        self.service.progress.connect(
            lambda it, merit: self._bridge.progress.emit(it, merit))
        self.service.finished.connect(
            lambda result: self._bridge.finished.emit(str(result)))
        self.service.failed.connect(
            lambda exc: self._bridge.finished.emit(f"failed: {exc}"))
        self._bridge.progress.connect(self._on_progress)
        self._bridge.finished.connect(self._on_finished)

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _fmt(v):
        return "" if v is None else f"{v:.6g}"

    def _table_group(self, title, model, on_add, on_remove):
        lay = QtWidgets.QVBoxLayout()
        lay.addWidget(QtWidgets.QLabel(title))
        view = QtWidgets.QTableView()
        view.setModel(model)
        lay.addWidget(view)
        row = QtWidgets.QHBoxLayout()
        add = QtWidgets.QPushButton("Add")
        add.clicked.connect(on_add)
        rm = QtWidgets.QPushButton("Remove")

        def _rm():
            idx = view.currentIndex()
            if idx.isValid():
                on_remove(idx.row())
                model.refresh()

        rm.clicked.connect(_rm)
        row.addWidget(add)
        row.addWidget(rm)
        lay.addLayout(row)
        return lay

    def _add_operand(self):
        if OperandDialog(self.service, self).exec():
            self.operand_model.refresh()

    def _add_variable(self):
        if VariableDialog(self.service, self).exec():
            self.variable_model.refresh()

    # -- run lifecycle ----------------------------------------------------
    def _run(self):
        name = self.optimizer.currentText()
        if name.startswith("—"):
            return
        err = self.service.validate_bounds_for_optimizer(name)
        if err:
            QtWidgets.QMessageBox.warning(self, "Bounds required", err)
            return
        self.btn_run.setEnabled(False)
        self.btn_stop.setEnabled(True)
        self.status.setText(f"running {name}...")
        self.service.run_async(name)

    def _on_progress(self, it: int, merit: float):
        self.status.setText(f"iteration {it}: merit {merit:.6g}")
        self._plot_history()

    def _on_finished(self, text: str):
        self.btn_run.setEnabled(True)
        self.btn_stop.setEnabled(False)
        h = self.service.merit_history
        if h:
            text = f"merit {h[0]:.6g} -> {h[-1]:.6g}; {text}"
        self.status.setText(text)
        self._plot_history()
        self.operand_model.refresh()
        self.variable_model.refresh()

    def _plot_history(self):
        self.ax.clear()
        if self.service.merit_history:
            self.ax.semilogy(self.service.merit_history)
        self.ax.set_xlabel("iteration")
        self.ax.set_ylabel("merit")
        self.canvas.draw_idle()


class _Bridge(QtCore.QObject):
    """Queued-connection bridge from worker-thread callbacks to Qt slots."""

    progress = QtCore.Signal(int, float)
    finished = QtCore.Signal(str)
