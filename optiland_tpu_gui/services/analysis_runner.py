"""Analysis panel backend (reference
`optiland_gui/services/analysis_runner.py:1-102` + the panel-side window
and settings logic of `optiland_gui/analysis_panel.py`): resolves analyses
through the registry, runs them against the connector's current Optic,
keeps the list of open result windows (one per run, paginated in the
panel), and round-trips per-analysis settings through JSON files."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from optiland_tpu_gui import registry


@dataclass
class AnalysisWindow:
    """One produced result: what the panel shows as a page/tab."""

    name: str
    settings: dict
    result: object
    seq: int
    title: str = ""
    created: float = field(default_factory=lambda: time.time())

    def __post_init__(self):
        if not self.title:
            self.title = f"{self.name} #{self.seq}"


class AnalysisRunner:
    """Headless core of the analysis panel."""

    def __init__(self, connector):
        self.connector = connector
        self.windows: list[AnalysisWindow] = []
        self.current_index: int = -1
        self.log: list[str] = []
        self._seq = 0
        # re-run the active window whenever the prescription changes and
        # auto-refresh is on (panel checkbox; default off like the ref)
        self.auto_refresh = False
        connector.system_changed.connect(self._on_system_changed)

    # -- registry passthrough -------------------------------------------
    def available_analyses(self) -> list[str]:
        return registry.names()

    def categories(self) -> list[str]:
        return registry.categories()

    def analyses_in(self, category: str) -> list[str]:
        return registry.names(category)

    def settings_schema(self, name: str) -> dict:
        return registry.settings_schema(name)

    def default_settings(self, name: str) -> dict:
        return registry.default_settings(name)

    # -- running ---------------------------------------------------------
    def run(self, name: str, **kwargs):
        """Instantiate the analysis on the current system and open a result
        window.  Returns the analysis object (each exposes `.view()`)."""
        cls = registry.resolve(name)
        t0 = time.time()
        obj = cls(self.connector.get_optic(), **kwargs)
        self._seq += 1
        win = AnalysisWindow(name=name, settings=dict(kwargs), result=obj,
                            seq=self._seq)
        self.windows.append(win)
        self.current_index = len(self.windows) - 1
        self._log(f"{name} ran in {time.time() - t0:.2f} s")
        return obj

    def rerun(self, index: int | None = None):
        """Re-run a window's analysis against the *current* system (the
        panel's Apply/Refresh button)."""
        if index is None:
            index = self.current_index
        win = self.windows[index]
        cls = registry.resolve(win.name)
        win.result = cls(self.connector.get_optic(), **win.settings)
        win.created = time.time()
        self._log(f"{win.title} refreshed")
        return win.result

    def view(self, name: str, **kwargs):
        """Run + render onto a matplotlib figure (Agg-safe)."""
        return self.run(name, **kwargs).view()

    # -- window management (panel pagination) ----------------------------
    def window_titles(self) -> list[str]:
        return [w.title for w in self.windows]

    def close_window(self, index: int) -> None:
        self.windows.pop(index)
        self.current_index = min(self.current_index, len(self.windows) - 1)

    def close_all(self) -> None:
        self.windows.clear()
        self.current_index = -1

    def select(self, index: int) -> AnalysisWindow:
        self.current_index = index
        return self.windows[index]

    @property
    def current(self) -> AnalysisWindow | None:
        if 0 <= self.current_index < len(self.windows):
            return self.windows[self.current_index]
        return None

    # -- settings persistence (Save/Load Settings buttons) ---------------
    def save_settings(self, path: str, index: int | None = None) -> None:
        win = self.windows[self.current_index if index is None else index]
        payload = {"analysis": win.name, "settings": win.settings}
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, indent=2)

    def load_settings(self, path: str) -> tuple[str, dict]:
        """Returns (analysis_name, settings); the panel then pre-selects
        the analysis and fills the settings form."""
        with open(path, encoding="utf-8") as fh:
            payload = json.load(fh)
        return payload["analysis"], dict(payload.get("settings", {}))

    # -- internals -------------------------------------------------------
    def _on_system_changed(self):
        if self.auto_refresh and self.current is not None:
            try:
                self.rerun()
            except Exception as exc:  # analysis may be invalid mid-edit
                self._log(f"auto-refresh failed: {exc}")

    def _log(self, msg: str) -> None:
        self.log.append(msg)
        del self.log[:-200]
