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
        "hover": "#35383d",
        "border": "#44474d",
    },
    "light": {
        "window_bg": "#f4f4f5",
        "panel_bg": "#ffffff",
        "text": "#1b1b1f",
        "accent": "#2d6cdf",
        "grid": "#d4d4d8",
        "hover": "#e8e8ea",
        "border": "#c9c9cd",
    },
    "midnight": {
        "window_bg": "#0b0d12",
        "panel_bg": "#14171e",
        "text": "#d8dce6",
        "accent": "#62b0ff",
        "grid": "#23262e",
        "hover": "#1b1f28",
        "border": "#2c313c",
    },
    "solarized_light": {
        "window_bg": "#fdf6e3",
        "panel_bg": "#eee8d5",
        "text": "#586e75",
        "accent": "#268bd2",
        "grid": "#d9d2c0",
        "hover": "#f3edda",
        "border": "#cfc8b5",
    },
    "solarized_dark": {
        "window_bg": "#002b36",
        "panel_bg": "#073642",
        "text": "#93a1a1",
        "accent": "#2aa198",
        "grid": "#0d4351",
        "hover": "#0a3d4a",
        "border": "#134e5e",
    },
}


def stylesheet(theme: str) -> str:
    """Full Qt stylesheet for a theme name (unknown names fall back to
    dark) — the compact analogue of the reference's QSS resource tree
    (`optiland_gui/resources/*.qss`), generated from the palette so every
    theme stays consistent across widget classes."""
    t = THEMES.get(theme, THEMES["dark"])
    return f"""
QMainWindow, QDialog {{ background: {t['window_bg']}; }}
QWidget {{ background: {t['panel_bg']}; color: {t['text']}; }}
QMenuBar, QMenu {{ background: {t['window_bg']}; color: {t['text']}; }}
QMenu::item:selected, QMenuBar::item:selected {{ background: {t['hover']}; }}
QPushButton {{ background: {t['accent']}; color: white;
    padding: 4px 10px; border-radius: 3px; border: none; }}
QPushButton:hover {{ background: {t['hover']}; color: {t['text']}; }}
QPushButton:disabled {{ background: {t['grid']}; color: {t['border']}; }}
QToolButton {{ background: transparent; color: {t['text']};
    border-radius: 3px; }}
QToolButton:checked {{ background: {t['accent']}; color: white; }}
QLineEdit, QPlainTextEdit, QTextEdit, QSpinBox, QDoubleSpinBox,
QComboBox {{ background: {t['window_bg']}; color: {t['text']};
    border: 1px solid {t['border']}; border-radius: 3px; padding: 2px; }}
QComboBox QAbstractItemView {{ background: {t['panel_bg']};
    color: {t['text']}; selection-background-color: {t['accent']}; }}
QTableView {{ background: {t['window_bg']}; alternate-background-color:
    {t['panel_bg']}; gridline-color: {t['grid']}; color: {t['text']};
    selection-background-color: {t['accent']}; }}
QHeaderView::section {{ background: {t['panel_bg']}; color: {t['text']};
    border: 1px solid {t['grid']}; padding: 3px; }}
QTabWidget::pane {{ border: 1px solid {t['border']}; }}
QTabBar::tab {{ background: {t['panel_bg']}; color: {t['text']};
    padding: 5px 12px; }}
QTabBar::tab:selected {{ background: {t['accent']}; color: white; }}
QDockWidget {{ titlebar-close-icon: none; color: {t['text']}; }}
QGroupBox {{ border: 1px solid {t['border']}; border-radius: 4px;
    margin-top: 8px; color: {t['text']}; }}
QGroupBox::title {{ subcontrol-origin: margin; left: 8px; }}
QScrollBar:vertical {{ background: {t['window_bg']}; width: 10px; }}
QScrollBar::handle:vertical {{ background: {t['grid']};
    border-radius: 5px; min-height: 24px; }}
QStatusBar {{ background: {t['window_bg']}; color: {t['text']}; }}
QListWidget {{ background: {t['window_bg']}; color: {t['text']};
    border: 1px solid {t['border']}; }}
QListWidget::item:selected {{ background: {t['accent']}; color: white; }}
"""


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
