"""System properties panel (reference
`optiland_gui/system_properties_panel.py:1-756`): tabbed editors for
aperture, fields, wavelengths, ray aiming, apodization/telecentricity,
pickups and solves, plus the first-order summary — all bound to the
headless `SystemService`."""

from __future__ import annotations

from PySide6 import QtWidgets


class SystemPropertiesPanel(QtWidgets.QWidget):
    def __init__(self, system_service):
        super().__init__()
        self.service = system_service
        outer = QtWidgets.QVBoxLayout(self)
        tabs = QtWidgets.QTabWidget()
        tabs.addTab(self._general_tab(), "General")
        tabs.addTab(self._fields_tab(), "Fields")
        tabs.addTab(self._wavelengths_tab(), "Wavelengths")
        tabs.addTab(self._constraints_tab(), "Pickups && Solves")
        outer.addWidget(tabs, 1)
        self.summary = QtWidgets.QPlainTextEdit()
        self.summary.setReadOnly(True)
        self.summary.setMaximumHeight(120)
        outer.addWidget(QtWidgets.QLabel("First-order properties"))
        outer.addWidget(self.summary)
        self.service.connector.system_changed.connect(self.refresh_summary)
        self.refresh_summary()

    # -- general: title, aperture, aiming, apodization, telecentric -------
    def _general_tab(self):
        w = QtWidgets.QWidget()
        form = QtWidgets.QFormLayout(w)

        self.title_edit = QtWidgets.QLineEdit(self.service.get_title())
        self.title_edit.editingFinished.connect(
            lambda: self.service.set_title(self.title_edit.text()))
        form.addRow("Title", self.title_edit)

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

        self.apod = QtWidgets.QComboBox()
        self.apod.addItems(self.service.get_apodization_types())
        self.apod.currentTextChanged.connect(self.service.set_apodization)
        form.addRow("Apodization", self.apod)

        self.telecentric = QtWidgets.QCheckBox("Object-space telecentric")
        self.telecentric.setChecked(self.service.get_telecentric())
        self.telecentric.toggled.connect(self.service.set_telecentric)
        form.addRow("", self.telecentric)
        return w

    def _apply_aperture(self):
        try:
            self.service.set_aperture(self.ap_type.currentText(),
                                      float(self.ap_value.text()))
        except ValueError:
            pass

    # -- fields tab -------------------------------------------------------
    def _fields_tab(self):
        w = QtWidgets.QWidget()
        lay = QtWidgets.QVBoxLayout(w)
        self.fields_table = QtWidgets.QTableWidget(0, 4)
        self.fields_table.setHorizontalHeaderLabels(["X", "Y", "VX", "VY"])
        lay.addWidget(self.fields_table)
        row = QtWidgets.QHBoxLayout()
        add = QtWidgets.QPushButton("Add field")
        add.clicked.connect(self._add_field_row)
        rm = QtWidgets.QPushButton("Remove field")
        rm.clicked.connect(
            lambda: self.fields_table.removeRow(
                self.fields_table.currentRow()))
        apply_btn = QtWidgets.QPushButton("Apply")
        apply_btn.clicked.connect(self._apply_fields)
        for b in (add, rm, apply_btn):
            row.addWidget(b)
        lay.addLayout(row)
        self._load_fields()
        return w

    def _load_fields(self):
        self.fields_table.setRowCount(0)
        for x, y, vx, vy in self.service.get_fields():
            self._add_field_row((x, y, vx, vy))

    def _add_field_row(self, values=(0.0, 0.0, 0.0, 0.0)):
        r = self.fields_table.rowCount()
        self.fields_table.insertRow(r)
        for c, v in enumerate(values if values else (0.0,) * 4):
            self.fields_table.setItem(
                r, c, QtWidgets.QTableWidgetItem(str(v)))

    def _apply_fields(self):
        rows = []
        for r in range(self.fields_table.rowCount()):
            vals = []
            for c in range(4):
                item = self.fields_table.item(r, c)
                vals.append(float(item.text()) if item else 0.0)
            rows.append(tuple(vals))
        self.service.set_fields(rows)

    # -- wavelengths tab --------------------------------------------------
    def _wavelengths_tab(self):
        w = QtWidgets.QWidget()
        lay = QtWidgets.QVBoxLayout(w)
        self.wl_table = QtWidgets.QTableWidget(0, 1)
        self.wl_table.setHorizontalHeaderLabels(["Wavelength (um)"])
        lay.addWidget(self.wl_table)
        row = QtWidgets.QHBoxLayout()
        self.primary_spin = QtWidgets.QSpinBox()
        row.addWidget(QtWidgets.QLabel("Primary index"))
        row.addWidget(self.primary_spin)
        add = QtWidgets.QPushButton("Add")
        add.clicked.connect(lambda: self._add_wl_row(0.5876))
        rm = QtWidgets.QPushButton("Remove")
        rm.clicked.connect(
            lambda: self.wl_table.removeRow(self.wl_table.currentRow()))
        apply_btn = QtWidgets.QPushButton("Apply")
        apply_btn.clicked.connect(self._apply_wavelengths)
        for b in (add, rm, apply_btn):
            row.addWidget(b)
        lay.addLayout(row)
        values, primary = self.service.get_wavelengths()
        for v in values:
            self._add_wl_row(v)
        self.primary_spin.setValue(primary)
        return w

    def _add_wl_row(self, value: float):
        r = self.wl_table.rowCount()
        self.wl_table.insertRow(r)
        self.wl_table.setItem(r, 0, QtWidgets.QTableWidgetItem(str(value)))
        self.primary_spin.setMaximum(max(0, self.wl_table.rowCount() - 1))

    def _apply_wavelengths(self):
        values = []
        for r in range(self.wl_table.rowCount()):
            item = self.wl_table.item(r, 0)
            if item and item.text().strip():
                values.append(float(item.text()))
        if values:
            self.service.set_wavelengths(values, self.primary_spin.value())

    # -- pickups / solves tab --------------------------------------------
    def _constraints_tab(self):
        w = QtWidgets.QWidget()
        lay = QtWidgets.QHBoxLayout(w)

        pick_box = QtWidgets.QVBoxLayout()
        pick_box.addWidget(QtWidgets.QLabel("Pickups"))
        self.pickup_list = QtWidgets.QListWidget()
        pick_box.addWidget(self.pickup_list)
        prow = QtWidgets.QHBoxLayout()
        self.pick_src = QtWidgets.QSpinBox()
        self.pick_attr = QtWidgets.QComboBox()
        self.pick_attr.addItems(["radius", "conic", "thickness"])
        self.pick_tgt = QtWidgets.QSpinBox()
        add_p = QtWidgets.QPushButton("Add")
        add_p.clicked.connect(self._add_pickup)
        rm_p = QtWidgets.QPushButton("Remove")
        rm_p.clicked.connect(self._remove_pickup)
        for x in (self.pick_src, self.pick_attr, self.pick_tgt, add_p, rm_p):
            prow.addWidget(x)
        pick_box.addLayout(prow)
        lay.addLayout(pick_box)

        solve_box = QtWidgets.QVBoxLayout()
        solve_box.addWidget(QtWidgets.QLabel("Solves"))
        self.solve_list = QtWidgets.QListWidget()
        solve_box.addWidget(self.solve_list)
        srow = QtWidgets.QHBoxLayout()
        self.solve_type = QtWidgets.QComboBox()
        self.solve_type.addItems(self.service.get_solve_types())
        add_s = QtWidgets.QPushButton("Add")
        add_s.clicked.connect(self._add_solve)
        rm_s = QtWidgets.QPushButton("Remove")
        rm_s.clicked.connect(self._remove_solve)
        for x in (self.solve_type, add_s, rm_s):
            srow.addWidget(x)
        solve_box.addLayout(srow)
        lay.addLayout(solve_box)

        self._reload_constraints()
        return w

    def _reload_constraints(self):
        self.pickup_list.clear()
        for p in self.service.get_pickups():
            self.pickup_list.addItem(
                f"S{p['target']}.{p['attr']} := S{p['source']}.{p['attr']}"
                f" x {p['scale']} + {p['offset']}")
        self.solve_list.clear()
        for s in self.service.get_solves():
            self.solve_list.addItem(f"{s['type']} (S{s['surface']})")

    def _add_pickup(self):
        self.service.add_pickup(self.pick_src.value(),
                                self.pick_attr.currentText(),
                                self.pick_tgt.value())
        self._reload_constraints()

    def _remove_pickup(self):
        row = self.pickup_list.currentRow()
        if row >= 0:
            self.service.remove_pickup(row)
            self._reload_constraints()

    def _add_solve(self):
        name = self.solve_type.currentText()
        if name == "quick_focus":
            self.service.add_solve(name)
        else:
            self.service.add_solve(name, 1)
        self._reload_constraints()

    def _remove_solve(self):
        row = self.solve_list.currentRow()
        if row >= 0:
            self.service.remove_solve(row)
            self._reload_constraints()

    # -- summary ----------------------------------------------------------
    def refresh_summary(self):
        rows = self.service.first_order()
        self.summary.setPlainText(
            "\n".join(f"{k:>5s}: {v:.6g}" for k, v in rows.items()))
