"""Action registry (reference `optiland_gui/action_manager.py`): central
name -> (label, shortcut, callable) table the menu bar, toolbar and
keyboard shortcuts are all built from. Qt-free — the main window turns
entries into QActions."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class Action:
    name: str
    label: str
    callback: Callable
    shortcut: str | None = None
    menu: str | None = None       # e.g. "&File"
    enabled: bool = True


@dataclass
class ActionManager:
    _actions: dict[str, Action] = field(default_factory=dict)

    def register(self, name: str, label: str, callback: Callable,
                 shortcut: str | None = None, menu: str | None = None):
        if name in self._actions:
            raise ValueError(f"action {name!r} already registered")
        self._actions[name] = Action(name, label, callback, shortcut, menu)
        return self._actions[name]

    def get(self, name: str) -> Action:
        return self._actions[name]

    def trigger(self, name: str):
        a = self._actions[name]
        if not a.enabled:
            return None
        return a.callback()

    def set_enabled(self, name: str, enabled: bool) -> None:
        self._actions[name].enabled = bool(enabled)

    def by_menu(self) -> dict[str, list[Action]]:
        out: dict[str, list[Action]] = {}
        for a in self._actions.values():
            out.setdefault(a.menu or "", []).append(a)
        return out

    def names(self) -> list[str]:
        return list(self._actions)


def default_actions(window) -> ActionManager:
    """The stock action set for a MainWindow (reference
    `action_manager.py` registers file/edit/view actions the same way)."""
    am = ActionManager()
    am.register("file.new", "&New", window.file_service.new_system,
                shortcut="Ctrl+N", menu="&File")
    am.register("file.open", "&Open...", getattr(window, "_open_dialog",
                                                 lambda: None),
                shortcut="Ctrl+O", menu="&File")
    am.register("file.save", "&Save", lambda: window.file_service.save(),
                shortcut="Ctrl+S", menu="&File")
    am.register("edit.undo", "&Undo", window.connector.undo,
                shortcut="Ctrl+Z", menu="&Edit")
    am.register("edit.redo", "&Redo", window.connector.redo,
                shortcut="Ctrl+Shift+Z", menu="&Edit")
    return am
