"""Window chrome (reference `optiland_gui/widgets/frameless_window.py:1-219`,
`custom_title_bar.py:1-227`, `custom_dock_title_bar.py:1-108`,
`custom_dock_widget.py`): a frameless main window with a draggable custom
title bar (min/max/close buttons) and matching dock-widget title bars."""

from __future__ import annotations

from PySide6 import QtCore, QtGui, QtWidgets


class CustomTitleBar(QtWidgets.QWidget):
    """Draggable title bar with window controls."""

    HEIGHT = 34

    def __init__(self, window: QtWidgets.QWidget, title: str = ""):
        super().__init__(window)
        self._window = window
        self._drag_pos: QtCore.QPoint | None = None
        self.setFixedHeight(self.HEIGHT)
        lay = QtWidgets.QHBoxLayout(self)
        lay.setContentsMargins(8, 0, 4, 0)
        self.title_label = QtWidgets.QLabel(title)
        lay.addWidget(self.title_label, 1)
        for text, slot in (("–", self._minimize), ("□", self._toggle_max),
                           ("✕", window.close)):
            btn = QtWidgets.QToolButton()
            btn.setText(text)
            btn.setAutoRaise(True)
            btn.clicked.connect(slot)
            lay.addWidget(btn)

    def setTitle(self, title: str) -> None:
        self.title_label.setText(title)

    def _minimize(self):
        self._window.showMinimized()

    def _toggle_max(self):
        if self._window.isMaximized():
            self._window.showNormal()
        else:
            self._window.showMaximized()

    # -- dragging ---------------------------------------------------------
    def mousePressEvent(self, event: QtGui.QMouseEvent):
        if event.button() == QtCore.Qt.LeftButton:
            self._drag_pos = (event.globalPosition().toPoint()
                              - self._window.frameGeometry().topLeft())
        event.accept()

    def mouseMoveEvent(self, event: QtGui.QMouseEvent):
        if self._drag_pos is not None and not self._window.isMaximized():
            self._window.move(event.globalPosition().toPoint()
                              - self._drag_pos)
        event.accept()

    def mouseReleaseEvent(self, event: QtGui.QMouseEvent):
        self._drag_pos = None
        event.accept()

    def mouseDoubleClickEvent(self, event: QtGui.QMouseEvent):
        self._toggle_max()


class FramelessWindow(QtWidgets.QMainWindow):
    """QMainWindow with the native frame replaced by CustomTitleBar."""

    RESIZE_MARGIN = 6

    def __init__(self, title: str = "optiland_tpu"):
        super().__init__()
        self.setWindowFlags(QtCore.Qt.FramelessWindowHint)
        self._container = QtWidgets.QWidget()
        self._vbox = QtWidgets.QVBoxLayout(self._container)
        self._vbox.setContentsMargins(0, 0, 0, 0)
        self._vbox.setSpacing(0)
        self.title_bar = CustomTitleBar(self, title)
        self._vbox.addWidget(self.title_bar)
        self._content = QtWidgets.QWidget()
        self._vbox.addWidget(self._content, 1)
        super().setCentralWidget(self._container)

    def setCentralWidget(self, widget: QtWidgets.QWidget) -> None:  # type: ignore[override]
        self._vbox.replaceWidget(self._content, widget)
        self._content.deleteLater()
        self._content = widget

    def setWindowTitle(self, title: str) -> None:  # type: ignore[override]
        super().setWindowTitle(title)
        self.title_bar.setTitle(title)


class CustomDockTitleBar(QtWidgets.QWidget):
    """Compact title bar for dock widgets (float + close buttons)."""

    def __init__(self, dock: QtWidgets.QDockWidget):
        super().__init__(dock)
        self._dock = dock
        lay = QtWidgets.QHBoxLayout(self)
        lay.setContentsMargins(6, 2, 2, 2)
        self.label = QtWidgets.QLabel(dock.windowTitle())
        lay.addWidget(self.label, 1)
        float_btn = QtWidgets.QToolButton()
        float_btn.setText("⇱")
        float_btn.setAutoRaise(True)
        float_btn.clicked.connect(
            lambda: dock.setFloating(not dock.isFloating()))
        lay.addWidget(float_btn)
        close_btn = QtWidgets.QToolButton()
        close_btn.setText("✕")
        close_btn.setAutoRaise(True)
        close_btn.clicked.connect(dock.close)
        lay.addWidget(close_btn)


class CustomDockWidget(QtWidgets.QDockWidget):
    """QDockWidget wired to the custom title bar and, optionally, to a
    PanelManager entry so visibility round-trips through the config."""

    def __init__(self, title: str, widget: QtWidgets.QWidget,
                 panels=None, panel_name: str | None = None):
        super().__init__(title)
        self.setWidget(widget)
        self.setTitleBarWidget(CustomDockTitleBar(self))
        self._panels = panels
        self._panel_name = panel_name
        if panels is not None and panel_name is not None:
            self.setVisible(panels.is_visible(panel_name))
            self.setFloating(panels.is_floating(panel_name))

    def setFloating(self, floating):  # noqa: N802 - Qt casing
        super().setFloating(floating)
        if self._panels is not None and self._panel_name is not None:
            self._panels.set_floating(self._panel_name, floating)

    def closeEvent(self, event):
        if self._panels is not None and self._panel_name is not None:
            self._panels.hide(self._panel_name)
        super().closeEvent(event)

    def showEvent(self, event):
        if self._panels is not None and self._panel_name is not None:
            self._panels.show(self._panel_name)
        super().showEvent(event)
