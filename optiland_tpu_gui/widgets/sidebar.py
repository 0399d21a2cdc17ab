"""Navigation sidebar (reference `optiland_gui/widgets/sidebar.py:1-212`):
a narrow vertical strip of checkable tool buttons that switches the main
window's central stack between panels."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets


class Sidebar(QtWidgets.QWidget):
    panel_selected = QtCore.Signal(str)

    WIDTH = 52

    def __init__(self, entries: list[tuple[str, str]] | None = None):
        """`entries`: list of (panel_name, label/emoji)."""
        super().__init__()
        self.setFixedWidth(self.WIDTH)
        self._lay = QtWidgets.QVBoxLayout(self)
        self._lay.setContentsMargins(2, 6, 2, 6)
        self._lay.setSpacing(4)
        self._group = QtWidgets.QButtonGroup(self)
        self._group.setExclusive(True)
        self._buttons: dict[str, QtWidgets.QToolButton] = {}
        for name, label in entries or []:
            self.add_entry(name, label)
        self._lay.addStretch(1)

    def add_entry(self, name: str, label: str) -> None:
        btn = QtWidgets.QToolButton()
        btn.setText(label)
        btn.setCheckable(True)
        btn.setToolTip(name)
        btn.setFixedSize(self.WIDTH - 8, self.WIDTH - 8)
        btn.clicked.connect(lambda: self.panel_selected.emit(name))
        self._group.addButton(btn)
        self._buttons[name] = btn
        # keep the stretch at the bottom
        self._lay.insertWidget(self._lay.count() - 1 if self._lay.count()
                               else 0, btn)

    def select(self, name: str) -> None:
        btn = self._buttons.get(name)
        if btn is not None:
            btn.setChecked(True)
            self.panel_selected.emit(name)
