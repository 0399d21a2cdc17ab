"""GUI configuration + themes (reference `optiland_gui/config.py` and the
qdarktheme usage in `main_window.py`): persisted JSON settings (theme,
recent files, panel layout) and Qt stylesheet palettes. Qt-free."""

from __future__ import annotations

import json
import os

MAX_RECENT = 8

THEMES: dict[str, dict[str, str]] = {
    "dark": {
        "window_bg": "#1e1f22",
        "panel_bg": "#2b2d31",
        "text": "#e6e6e6",
        "accent": "#4f8cc9",
        "grid": "#3a3d41",
    },
    "light": {
        "window_bg": "#f4f4f5",
        "panel_bg": "#ffffff",
        "text": "#1b1b1f",
        "accent": "#2d6cdf",
        "grid": "#d4d4d8",
    },
}


def stylesheet(theme: str) -> str:
    """Qt stylesheet for a theme name (unknown names fall back to dark)."""
    t = THEMES.get(theme, THEMES["dark"])
    return (
        f"QMainWindow, QDialog {{ background: {t['window_bg']}; }}\n"
        f"QWidget {{ background: {t['panel_bg']}; color: {t['text']}; }}\n"
        f"QPushButton {{ background: {t['accent']}; color: white; "
        "padding: 4px 10px; border-radius: 3px; }\n"
        f"QTableView {{ gridline-color: {t['grid']}; }}\n"
    )


class GuiConfig:
    """Settings persisted to `~/.optiland_tpu/gui.json` (path overridable
    for tests)."""

    def __init__(self, path: str | None = None):
        self.path = path or os.path.join(
            os.path.expanduser("~"), ".optiland_tpu", "gui.json")
        self.data: dict = {"theme": "dark", "recent_files": []}
        self.load()

    # -- persistence -----------------------------------------------------
    def load(self) -> None:
        try:
            with open(self.path) as f:
                stored = json.load(f)
            if isinstance(stored, dict):
                self.data.update(stored)
        except (OSError, ValueError):
            pass

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self.data, f, indent=1)

    # -- typed accessors -------------------------------------------------
    @property
    def theme(self) -> str:
        return self.data.get("theme", "dark")

    @theme.setter
    def theme(self, name: str) -> None:
        if name not in THEMES:
            raise ValueError(f"unknown theme {name!r}; have {sorted(THEMES)}")
        self.data["theme"] = name
        self.save()

    @property
    def recent_files(self) -> list[str]:
        return list(self.data.get("recent_files", []))

    def add_recent_file(self, path: str) -> None:
        rec = [p for p in self.recent_files if p != path]
        rec.insert(0, path)
        self.data["recent_files"] = rec[:MAX_RECENT]
        self.save()

    def get(self, key: str, default=None):
        return self.data.get(key, default)

    def set(self, key: str, value) -> None:
        self.data[key] = value
        self.save()
