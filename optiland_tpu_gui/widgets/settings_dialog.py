"""Settings dialog (reference `optiland_gui/main_window.py` settings /
preferences dialog): edits the persisted GuiConfig — theme, viewer
defaults, autosave — and applies the theme immediately."""

from __future__ import annotations

from PySide6 import QtWidgets

from optiland_tpu_gui.settings import THEMES


class SettingsDialog(QtWidgets.QDialog):
    def __init__(self, main_window, parent=None):
        super().__init__(parent)
        self.main_window = main_window
        self.config = main_window.config
        self.setWindowTitle("Settings")
        form = QtWidgets.QFormLayout(self)

        self.theme = QtWidgets.QComboBox()
        self.theme.addItems(sorted(THEMES))
        self.theme.setCurrentText(self.config.theme)
        form.addRow("Theme", self.theme)

        self.num_rays = QtWidgets.QSpinBox()
        self.num_rays.setRange(1, 512)
        self.num_rays.setValue(int(self.config.get("viewer.num_rays", 24)))
        form.addRow("Viewer rays", self.num_rays)

        self.autosave = QtWidgets.QCheckBox("Autosave on exit")
        self.autosave.setChecked(bool(self.config.get("autosave", False)))
        form.addRow(self.autosave)

        self.confirm_close = QtWidgets.QCheckBox(
            "Confirm before closing unsaved systems")
        self.confirm_close.setChecked(
            bool(self.config.get("confirm_close", True)))
        form.addRow(self.confirm_close)

        buttons = QtWidgets.QDialogButtonBox(
            QtWidgets.QDialogButtonBox.Ok | QtWidgets.QDialogButtonBox.Cancel)
        buttons.accepted.connect(self._apply)
        buttons.rejected.connect(self.reject)
        form.addRow(buttons)

    def _apply(self):
        self.main_window.set_theme(self.theme.currentText())
        self.config.set("viewer.num_rays", int(self.num_rays.value()))
        self.config.set("autosave", bool(self.autosave.isChecked()))
        self.config.set("confirm_close",
                        bool(self.confirm_close.isChecked()))
        self.config.save()
        self.accept()
