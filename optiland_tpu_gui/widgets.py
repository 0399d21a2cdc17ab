"""Qt widgets binding the headless services (reference
`optiland_gui/lens_editor.py`, `analysis_panel.py`,
`optimization_panel.py`, `viewer_panel.py`). Importable only with PySide6
installed; every behavior they expose lives in the services and is covered
by the headless tests."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets
from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg


class LensTableModel(QtCore.QAbstractTableModel):
    """Spreadsheet model over `SurfaceService` (reference
    `lens_editor.py` table model)."""

    def __init__(self, service):
        super().__init__()
        self.service = service
        self.service.connector.system_changed.connect(
            lambda: self.layoutChanged.emit())

    def rowCount(self, parent=None):
        return self.service.get_surface_count()

    def columnCount(self, parent=None):
        return len(self.service.get_column_headers())

    def headerData(self, section, orientation, role):
        if role != QtCore.Qt.DisplayRole:
            return None
        if orientation == QtCore.Qt.Horizontal:
            return self.service.get_column_headers()[section]
        return self.service.row_label(section)

    def data(self, index, role):
        if role in (QtCore.Qt.DisplayRole, QtCore.Qt.EditRole):
            v = self.service.get_surface_data(index.row(), index.column())
            return "" if v is None else str(v)
        return None

    def setData(self, index, value, role):
        if role != QtCore.Qt.EditRole:
            return False
        try:
            self.service.set_surface_data(index.row(), index.column(), value)
        except (ValueError, KeyError):
            return False
        return True

    def flags(self, index):
        return (QtCore.Qt.ItemIsEnabled | QtCore.Qt.ItemIsSelectable
                | QtCore.Qt.ItemIsEditable)


class LensEditor(QtWidgets.QWidget):
    def __init__(self, surface_service):
        super().__init__()
        self.service = surface_service
        lay = QtWidgets.QVBoxLayout(self)
        self.table = QtWidgets.QTableView()
        self.model = LensTableModel(surface_service)
        self.table.setModel(self.model)
        lay.addWidget(self.table)
        row = QtWidgets.QHBoxLayout()
        add = QtWidgets.QPushButton("Insert surface")
        rm = QtWidgets.QPushButton("Remove surface")
        add.clicked.connect(self._add)
        rm.clicked.connect(self._remove)
        row.addWidget(add)
        row.addWidget(rm)
        lay.addLayout(row)

    def _current_row(self):
        idx = self.table.currentIndex()
        return idx.row() if idx.isValid() else self.model.rowCount() - 1

    def _add(self):
        self.service.add_surface(max(1, self._current_row()))

    def _remove(self):
        try:
            self.service.remove_surface(self._current_row())
        except ValueError:
            pass


class AnalysisPanel(QtWidgets.QWidget):
    """Analysis chooser + matplotlib canvas (reference
    `analysis_panel.py`)."""

    def __init__(self, runner):
        super().__init__()
        self.runner = runner
        lay = QtWidgets.QVBoxLayout(self)
        self.selector = QtWidgets.QComboBox()
        self.selector.addItems(runner.available_analyses())
        run = QtWidgets.QPushButton("Run")
        run.clicked.connect(self.run_selected)
        top = QtWidgets.QHBoxLayout()
        top.addWidget(self.selector)
        top.addWidget(run)
        lay.addLayout(top)
        self.canvas_holder = QtWidgets.QVBoxLayout()
        lay.addLayout(self.canvas_holder)

    def run_selected(self):
        out = self.runner.view(self.selector.currentText())
        fig = out[0] if isinstance(out, tuple) else out
        while self.canvas_holder.count():
            w = self.canvas_holder.takeAt(0).widget()
            if w:
                w.deleteLater()
        self.canvas_holder.addWidget(FigureCanvasQTAgg(fig))


class OptimizationPanel(QtWidgets.QWidget):
    def __init__(self, service):
        super().__init__()
        self.service = service
        lay = QtWidgets.QVBoxLayout(self)
        self.optimizer = QtWidgets.QComboBox()
        self.optimizer.addItems(service.OPTIMIZERS)
        self.log = QtWidgets.QPlainTextEdit()
        self.log.setReadOnly(True)
        run = QtWidgets.QPushButton("Optimize")
        run.clicked.connect(self._run)
        lay.addWidget(self.optimizer)
        lay.addWidget(run)
        lay.addWidget(self.log)

    def _run(self):
        result = self.service.run(self.optimizer.currentText())
        h = self.service.merit_history
        self.log.appendPlainText(
            f"merit {h[0]:.6g} -> {h[-1]:.6g} ({result})")


class ViewerPanel(QtWidgets.QWidget):
    """Embedded 2D system viewer (reference `viewer_panel.py`)."""

    def __init__(self, connector):
        super().__init__()
        self.connector = connector
        self.lay = QtWidgets.QVBoxLayout(self)
        connector.system_changed.connect(self.refresh)
        self.refresh()

    def refresh(self):
        from optiland_tpu.visualization import OpticViewer

        while self.lay.count():
            w = self.lay.takeAt(0).widget()
            if w:
                w.deleteLater()
        fig, _ = OpticViewer(self.connector.get_optic()).view()
        self.lay.addWidget(FigureCanvasQTAgg(fig))


class SystemPropertiesPanel(QtWidgets.QWidget):
    """Aperture / field-type / ray-aiming / wavelengths editor + first-order
    summary (reference `system_properties_panel.py`), bound to
    `SystemService`."""

    def __init__(self, system_service):
        super().__init__()
        self.service = system_service
        form = QtWidgets.QFormLayout(self)

        self.ap_type = QtWidgets.QComboBox()
        self.ap_type.addItems(self.service.get_aperture_types())
        self.ap_value = QtWidgets.QLineEdit()
        cur_t, cur_v = self.service.get_aperture()
        if cur_t:
            self.ap_type.setCurrentText(cur_t)
        self.ap_value.setText(str(cur_v))
        apply_ap = QtWidgets.QPushButton("Apply")
        apply_ap.clicked.connect(self._apply_aperture)
        row = QtWidgets.QHBoxLayout()
        row.addWidget(self.ap_type)
        row.addWidget(self.ap_value)
        row.addWidget(apply_ap)
        form.addRow("Aperture", row)

        self.field_type = QtWidgets.QComboBox()
        for label, key in self.service.get_field_types():
            self.field_type.addItem(label, key)
        self.field_type.currentIndexChanged.connect(
            lambda _=None: self.service.set_field_type(
                self.field_type.currentData()))
        form.addRow("Field type", self.field_type)

        self.aiming = QtWidgets.QComboBox()
        self.aiming.addItems(self.service.get_ray_aiming_modes())
        self.aiming.currentTextChanged.connect(self.service.set_ray_aiming)
        form.addRow("Ray aiming", self.aiming)

        self.summary = QtWidgets.QPlainTextEdit()
        self.summary.setReadOnly(True)
        form.addRow("First order", self.summary)
        self.service.connector.system_changed.connect(self.refresh_summary)
        self.refresh_summary()

    def _apply_aperture(self):
        try:
            self.service.set_aperture(self.ap_type.currentText(),
                                      float(self.ap_value.text()))
        except ValueError:
            pass

    def refresh_summary(self):
        rows = self.service.first_order()
        self.summary.setPlainText(
            "\n".join(f"{k:>5s}: {v:.6g}" for k, v in rows.items()))


class SagViewerPanel(QtWidgets.QWidget):
    """Surface-sag cross-section/heatmap panel (reference
    `visualization/surface_sag_viewer.py` embedded per `viewer_panel.py`)."""

    def __init__(self, connector):
        super().__init__()
        self.connector = connector
        lay = QtWidgets.QVBoxLayout(self)
        top = QtWidgets.QHBoxLayout()
        self.surface = QtWidgets.QSpinBox()
        self.surface.setMinimum(1)
        show = QtWidgets.QPushButton("Show sag")
        show.clicked.connect(self.refresh)
        top.addWidget(QtWidgets.QLabel("Surface"))
        top.addWidget(self.surface)
        top.addWidget(show)
        lay.addLayout(top)
        self.holder = QtWidgets.QVBoxLayout()
        lay.addLayout(self.holder)

    def refresh(self):
        from optiland_tpu.visualization import SurfaceSagViewer

        while self.holder.count():
            w = self.holder.takeAt(0).widget()
            if w:
                w.deleteLater()
        viewer = SurfaceSagViewer(self.connector.get_optic())
        fig = viewer.view(self.surface.value())
        fig = fig[0] if isinstance(fig, tuple) else fig
        self.holder.addWidget(FigureCanvasQTAgg(fig))
