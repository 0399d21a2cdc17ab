"""Toast overlay widget (reference `optiland_gui/widgets/toast.py:1-343`):
renders the headless `ToastManager`'s visible toasts as auto-fading labels
stacked in the parent window's bottom-right corner."""

from __future__ import annotations

from PySide6 import QtCore, QtWidgets

_COLORS = {"info": "#2d6cdf", "success": "#2e9e5b",
           "warning": "#d98f00", "error": "#cc3b3b"}


class _ToastLabel(QtWidgets.QLabel):
    def __init__(self, toast, parent):
        super().__init__(toast.message, parent)
        color = _COLORS.get(toast.level, "#2d6cdf")
        self.setStyleSheet(
            f"background: {color}; color: white; border-radius: 6px;"
            "padding: 8px 14px; font-weight: 500;")
        self.setWindowOpacity(0.95)


class ToastOverlay(QtWidgets.QWidget):
    """Attach to a window: `ToastOverlay(manager, parent=main_window)`."""

    MARGIN = 16
    SPACING = 8

    def __init__(self, manager, parent: QtWidgets.QWidget):
        super().__init__(parent)
        self.manager = manager
        self._labels: dict[int, _ToastLabel] = {}
        self.setAttribute(QtCore.Qt.WA_TransparentForMouseEvents)
        manager.shown.connect(self._on_shown)
        manager.dismissed.connect(self._on_dismissed)
        # drive expiry from the Qt event loop
        self._timer = QtCore.QTimer(self)
        self._timer.timeout.connect(manager.tick)
        self._timer.start(250)

    def _on_shown(self, toast):
        label = _ToastLabel(toast, self.parentWidget())
        self._labels[id(toast)] = label
        label.adjustSize()
        label.show()
        self._relayout()

    def _on_dismissed(self, toast):
        label = self._labels.pop(id(toast), None)
        if label is not None:
            label.deleteLater()
            self._relayout()

    def _relayout(self):
        parent = self.parentWidget()
        if parent is None:
            return
        y = parent.height() - self.MARGIN
        for toast in reversed(self.manager.visible):
            label = self._labels.get(id(toast))
            if label is None:
                continue
            y -= label.height()
            label.move(parent.width() - label.width() - self.MARGIN, y)
            y -= self.SPACING
