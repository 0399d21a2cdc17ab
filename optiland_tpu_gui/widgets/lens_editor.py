"""Lens-editor spreadsheet (reference `optiland_gui/lens_editor.py:1-662`):
a QTableView over `SurfaceService` with a surface-type combo delegate,
per-row dynamic headers (paraxial rows edit Focal Length), material display
with resolved index, stop-surface marking, and a geometry-parameters dialog
for freeform rows."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets

from optiland_tpu_gui.services.surface_service import COL_RADIUS, COL_TYPE


class LensTableModel(QtCore.QAbstractTableModel):
    """Spreadsheet model over `SurfaceService`."""

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
        row, col = index.row(), index.column()
        if role == QtCore.Qt.ToolTipRole and col == COL_RADIUS:
            # paraxial rows repurpose this column (reference per-row headers)
            return self.service.get_column_headers_for(row)[COL_RADIUS]
        if role in (QtCore.Qt.DisplayRole, QtCore.Qt.EditRole):
            v = self.service.get_surface_data(row, col)
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


class SurfaceTypeDelegate(QtWidgets.QStyledItemDelegate):
    """Combo-box editor for the Type column (reference
    `lens_editor.py` type delegate)."""

    def __init__(self, service, parent=None):
        super().__init__(parent)
        self.service = service

    def createEditor(self, parent, option, index):
        if index.column() != COL_TYPE:
            return super().createEditor(parent, option, index)
        combo = QtWidgets.QComboBox(parent)
        combo.addItems(self.service.get_available_surface_types())
        return combo

    def setEditorData(self, editor, index):
        if isinstance(editor, QtWidgets.QComboBox):
            editor.setCurrentText(str(index.data(QtCore.Qt.EditRole)))
        else:
            super().setEditorData(editor, index)

    def setModelData(self, editor, model, index):
        if isinstance(editor, QtWidgets.QComboBox):
            model.setData(index, editor.currentText(), QtCore.Qt.EditRole)
        else:
            super().setModelData(editor, model, index)


class GeometryParamsDialog(QtWidgets.QDialog):
    """Freeform geometry parameter editor (reference
    `lens_editor.py` geometry dialogs / `surface_service.py:624-806`)."""

    def __init__(self, service, row: int, parent=None):
        super().__init__(parent)
        self.service = service
        self.row = row
        params = service.get_surface_geometry_params(row)
        self.setWindowTitle(f"Surface {row}: {params.pop('geometry')}")
        form = QtWidgets.QFormLayout(self)
        self.edits: dict[str, QtWidgets.QLineEdit] = {}
        for key, val in params.items():
            if isinstance(val, (list, tuple)):
                text = ", ".join(str(v) for v in val)
            else:
                text = "" if val is None else str(val)
            edit = QtWidgets.QLineEdit(text)
            self.edits[key] = edit
            form.addRow(key, edit)
        buttons = QtWidgets.QDialogButtonBox(
            QtWidgets.QDialogButtonBox.Ok | QtWidgets.QDialogButtonBox.Cancel)
        buttons.accepted.connect(self._apply)
        buttons.rejected.connect(self.reject)
        form.addRow(buttons)

    def _apply(self):
        out: dict = {}
        for key, edit in self.edits.items():
            text = edit.text().strip()
            if not text:
                continue
            if "," in text:
                out[key] = [float(v) for v in text.split(",") if v.strip()]
            else:
                try:
                    out[key] = float(text)
                except ValueError:
                    out[key] = text
        try:
            self.service.set_surface_geometry_params(self.row, out)
        except (ValueError, KeyError) as exc:
            QtWidgets.QMessageBox.warning(self, "Invalid parameters",
                                          str(exc))
            return
        self.accept()


class LensEditor(QtWidgets.QWidget):
    """The lens data editor panel."""

    def __init__(self, surface_service):
        super().__init__()
        self.service = surface_service
        lay = QtWidgets.QVBoxLayout(self)
        self.table = QtWidgets.QTableView()
        self.model = LensTableModel(surface_service)
        self.table.setModel(self.model)
        self.table.setItemDelegate(SurfaceTypeDelegate(surface_service,
                                                       self.table))
        lay.addWidget(self.table)
        row = QtWidgets.QHBoxLayout()
        for label, slot in (("Insert surface", self._add),
                            ("Remove surface", self._remove),
                            ("Make stop", self._make_stop),
                            ("Geometry...", self._geometry_dialog)):
            btn = QtWidgets.QPushButton(label)
            btn.clicked.connect(slot)
            row.addWidget(btn)
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

    def _make_stop(self):
        self.service.set_stop(self._current_row())

    def _geometry_dialog(self):
        GeometryParamsDialog(self.service, self._current_row(), self).exec()
