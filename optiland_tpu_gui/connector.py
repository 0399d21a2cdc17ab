"""The connector: single owner of the live Optic for the whole GUI
(reference `optiland_gui/optiland_connector.py`). Qt-free — "signals" are
plain callback lists so every service is testable headless; the widget
layer subscribes Qt slots to them."""

from __future__ import annotations

from optiland_tpu.system.optic import Optic
from optiland_tpu_gui.undo_redo import UndoRedoManager


def _default_system() -> Optic:
    import math

    lens = Optic("Untitled")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=100.0, thickness=5.0, material=1.5,
                     is_stop=True)
    lens.add_surface(index=2, radius=-100.0, thickness=95.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0.0)
    lens.add_wavelength(0.5876, is_primary=True)
    return lens


class Signal:
    """Minimal observable: `connect(fn)` + `emit(*args)`."""

    def __init__(self):
        self._subs = []

    def connect(self, fn):
        self._subs.append(fn)

    def emit(self, *args, **kw):
        for fn in list(self._subs):
            fn(*args, **kw)


class OptilandConnector:
    """Holds the current system; all GUI mutations go through here so
    undo/redo and change notification stay consistent (reference
    `optiland_connector.py` responsibilities)."""

    def __init__(self, optic: Optic | None = None):
        self._optic = optic if optic is not None else _default_system()
        self.undo_manager = UndoRedoManager()
        self.filepath: str | None = None
        self.modified = False
        self.system_changed = Signal()   # any change to the prescription
        self.file_changed = Signal()     # new/open/save

    # -- access ----------------------------------------------------------
    def get_optic(self) -> Optic:
        return self._optic

    def set_optic(self, optic: Optic) -> None:
        self._optic = optic
        self.undo_manager.clear()
        self.modified = False
        self.system_changed.emit()
        self.file_changed.emit()

    # -- mutation protocol ------------------------------------------------
    def snapshot(self) -> dict:
        return self._optic.to_dict()

    def begin_change(self) -> None:
        """Call before a mutating operation: records the undo snapshot."""
        self.undo_manager.push(self.snapshot())

    def notify_changed(self) -> None:
        self.modified = True
        self.system_changed.emit()

    def mutate(self, fn):
        """Run `fn(optic)` as one undoable operation."""
        self.begin_change()
        try:
            out = fn(self._optic)
        except Exception:
            # roll back the pushed snapshot on failure
            self.undo_manager.undo(self.snapshot())
            self.undo_manager._redo.clear()
            raise
        self.notify_changed()
        return out

    def undo(self) -> bool:
        state = self.undo_manager.undo(self.snapshot())
        if state is None:
            return False
        self._optic = Optic.from_dict(state)
        self.notify_changed()
        return True

    def redo(self) -> bool:
        state = self.undo_manager.redo(self.snapshot())
        if state is None:
            return False
        self._optic = Optic.from_dict(state)
        self.notify_changed()
        return True
