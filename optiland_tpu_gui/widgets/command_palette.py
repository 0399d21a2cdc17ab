"""Command palette dialog (reference
`optiland_gui/widgets/command_palette.py:1-532`): Ctrl+Shift+P popup with a
search box over the headless `CommandPalette` model; Enter executes the
selected command, arrows navigate, Esc dismisses."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets


class CommandPaletteDialog(QtWidgets.QDialog):
    def __init__(self, palette, parent=None):
        super().__init__(parent)
        self.palette_model = palette
        self.setWindowFlags(QtCore.Qt.Popup | QtCore.Qt.FramelessWindowHint)
        self.setMinimumWidth(480)
        lay = QtWidgets.QVBoxLayout(self)
        self.search = QtWidgets.QLineEdit()
        self.search.setPlaceholderText("Type a command...")
        self.search.textChanged.connect(self._refresh)
        self.search.installEventFilter(self)
        lay.addWidget(self.search)
        self.list = QtWidgets.QListWidget()
        self.list.itemActivated.connect(self._run_item)
        lay.addWidget(self.list)
        self._refresh("")

    def _refresh(self, text: str):
        self.list.clear()
        for cmd in self.palette_model.query(text):
            label = cmd.title
            if cmd.shortcut:
                label += f"   ({cmd.shortcut})"
            if cmd.category:
                label = f"{cmd.category}: {label}"
            item = QtWidgets.QListWidgetItem(label)
            item.setData(QtCore.Qt.UserRole, cmd.id)
            self.list.addItem(item)
        if self.list.count():
            self.list.setCurrentRow(0)

    def _run_item(self, item: QtWidgets.QListWidgetItem):
        cmd_id = item.data(QtCore.Qt.UserRole)
        self.accept()
        self.palette_model.execute(cmd_id)

    def eventFilter(self, obj, event):
        """Arrow keys move the list selection while typing; Enter runs."""
        if obj is self.search and event.type() == QtCore.QEvent.KeyPress:
            key = event.key()
            if key in (QtCore.Qt.Key_Down, QtCore.Qt.Key_Up):
                row = self.list.currentRow()
                step = 1 if key == QtCore.Qt.Key_Down else -1
                n = self.list.count()
                if n:
                    self.list.setCurrentRow((row + step) % n)
                return True
            if key in (QtCore.Qt.Key_Return, QtCore.Qt.Key_Enter):
                item = self.list.currentItem()
                if item is not None:
                    self._run_item(item)
                return True
        return super().eventFilter(obj, event)
