"""Panel manager (reference `optiland_gui/panel_manager.py`): tracks which
panels are open/visible and persists the layout via GuiConfig. Qt-free —
the main window maps panel names to QDockWidget/tab visibility."""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_PANELS = (
    "lens_editor",
    "system_properties",
    "analysis",
    "optimization",
    "viewer",
    "sag_viewer",
    "console",
    "script_editor",
)


@dataclass
class PanelState:
    name: str
    visible: bool = True
    order: int = 0
    floating: bool = False


@dataclass
class PanelManager:
    """Open/close/reorder panels; `save`/`restore` round-trip the layout
    through a GuiConfig (`layout` key)."""

    config: object | None = None
    _panels: dict[str, PanelState] = field(default_factory=dict)

    def __post_init__(self):
        for i, name in enumerate(DEFAULT_PANELS):
            self._panels[name] = PanelState(name, True, i)
        if self.config is not None:
            self.restore()

    def names(self) -> list[str]:
        return [p.name for p in
                sorted(self._panels.values(), key=lambda p: p.order)]

    def visible_panels(self) -> list[str]:
        return [n for n in self.names() if self._panels[n].visible]

    def is_visible(self, name: str) -> bool:
        return self._panels[name].visible

    def show(self, name: str) -> None:
        self._panels[name].visible = True
        self.save()

    def hide(self, name: str) -> None:
        self._panels[name].visible = False
        self.save()

    def toggle(self, name: str) -> bool:
        p = self._panels[name]
        p.visible = not p.visible
        self.save()
        return p.visible

    def is_floating(self, name: str) -> bool:
        return self._panels[name].floating

    def set_floating(self, name: str, floating: bool) -> None:
        self._panels[name].floating = bool(floating)
        self.save()

    def move(self, name: str, new_order: int) -> None:
        order = [n for n in self.names() if n != name]
        order.insert(max(0, min(new_order, len(order))), name)
        for i, n in enumerate(order):
            self._panels[n].order = i
        self.save()

    # -- persistence ------------------------------------------------------
    def save(self) -> None:
        if self.config is None:
            return
        self.config.set("layout", {
            n: {"visible": p.visible, "order": p.order,
                "floating": p.floating}
            for n, p in self._panels.items()})

    def restore(self) -> None:
        if self.config is None:
            return
        stored = self.config.get("layout") or {}
        for n, st in stored.items():
            if n in self._panels and isinstance(st, dict):
                self._panels[n].visible = bool(st.get("visible", True))
                self._panels[n].order = int(st.get("order", 0))
                self._panels[n].floating = bool(st.get("floating", False))
