"""Undo/redo by whole-system JSON snapshots (reference
`optiland_gui/undo_redo_manager.py:1-134` — same design: the connector
serializes the Optic around every mutating operation)."""

from __future__ import annotations


class UndoRedoManager:
    """Snapshot stack with a bounded depth."""

    def __init__(self, max_depth: int = 100):
        self._undo: list[dict] = []
        self._redo: list[dict] = []
        self.max_depth = max_depth

    def push(self, snapshot: dict) -> None:
        """Record the state BEFORE a mutating operation."""
        self._undo.append(snapshot)
        if len(self._undo) > self.max_depth:
            self._undo.pop(0)
        self._redo.clear()

    def can_undo(self) -> bool:
        return bool(self._undo)

    def can_redo(self) -> bool:
        return bool(self._redo)

    def undo(self, current: dict) -> dict | None:
        if not self._undo:
            return None
        self._redo.append(current)
        return self._undo.pop()

    def redo(self, current: dict) -> dict | None:
        if not self._redo:
            return None
        self._undo.append(current)
        return self._redo.pop()

    def clear(self) -> None:
        self._undo.clear()
        self._redo.clear()
