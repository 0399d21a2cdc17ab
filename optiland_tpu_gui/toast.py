"""Toast notification model (reference `optiland_gui/widgets/toast.py:1-343`
minus the animation chrome): a bounded queue of timed notifications with
levels, used by every service to surface non-blocking status. The Qt widget
subscribes to `shown`/`dismissed` and animates; tests drive `tick()`."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from optiland_tpu_gui.connector import Signal

INFO, SUCCESS, WARNING, ERROR = "info", "success", "warning", "error"
_DEFAULT_DURATION = {INFO: 3.0, SUCCESS: 3.0, WARNING: 5.0, ERROR: 8.0}


@dataclass
class Toast:
    message: str
    level: str = INFO
    duration: float = 0.0
    created: float = field(default_factory=time.monotonic)

    def __post_init__(self):
        if not self.duration:
            self.duration = _DEFAULT_DURATION.get(self.level, 3.0)


class ToastManager:
    """At most `max_visible` toasts on screen; the rest queue."""

    def __init__(self, max_visible: int = 3):
        self.max_visible = max_visible
        self.visible: list[Toast] = []
        self.queue: list[Toast] = []
        self.history: list[Toast] = []
        self.shown = Signal()      # emits (toast)
        self.dismissed = Signal()  # emits (toast)

    def notify(self, message: str, level: str = INFO,
               duration: float = 0.0) -> Toast:
        t = Toast(message, level, duration)
        self.history.append(t)
        del self.history[:-200]
        if len(self.visible) < self.max_visible:
            self.visible.append(t)
            self.shown.emit(t)
        else:
            self.queue.append(t)
        return t

    def info(self, msg: str):
        return self.notify(msg, INFO)

    def success(self, msg: str):
        return self.notify(msg, SUCCESS)

    def warning(self, msg: str):
        return self.notify(msg, WARNING)

    def error(self, msg: str):
        return self.notify(msg, ERROR)

    def dismiss(self, toast: Toast) -> None:
        if toast in self.visible:
            self.visible.remove(toast)
            self.dismissed.emit(toast)
            self._promote()

    def tick(self, now: float | None = None) -> None:
        """Expire visible toasts whose duration elapsed (the Qt widget
        calls this from a QTimer)."""
        now = time.monotonic() if now is None else now
        for t in list(self.visible):
            if now - t.created >= t.duration:
                self.dismiss(t)

    def _promote(self) -> None:
        while self.queue and len(self.visible) < self.max_visible:
            t = self.queue.pop(0)
            t.created = time.monotonic()
            self.visible.append(t)
            self.shown.emit(t)
