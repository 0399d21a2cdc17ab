"""Command palette model (reference
`optiland_gui/widgets/command_palette.py:1-532`, Qt chrome stripped):
a searchable registry of every GUI action with fuzzy-subsequence ranking,
recent-command boosting, and execution — headless so the ranking logic is
testable without Qt. The Qt widget is a list view over `query()`."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Command:
    id: str
    title: str
    callback: object
    category: str = ""
    shortcut: str = ""
    keywords: tuple[str, ...] = ()
    enabled: object = None  # optional () -> bool


def fuzzy_score(query: str, text: str) -> float | None:
    """Subsequence match score in [0, 1]; None if no match.

    Scoring matches the reference palette's feel: earlier matches and
    consecutive runs score higher; word-boundary hits get a bonus.
    """
    q = query.lower()
    t = text.lower()
    if not q:
        return 0.5
    score = 0.0
    ti = 0
    prev_hit = -2
    for ch in q:
        found = t.find(ch, ti)
        if found < 0:
            return None
        bonus = 1.0
        if found == prev_hit + 1:
            bonus += 1.0  # consecutive run
        if found == 0 or t[found - 1] in " _-/.":
            bonus += 1.0  # word boundary
        score += bonus / (1.0 + 0.02 * found)  # early matches worth more
        prev_hit = found
        ti = found + 1
    return score / (3.0 * len(q))


class CommandPalette:
    def __init__(self):
        self._commands: dict[str, Command] = {}
        self._recent: list[str] = []

    def register(self, id: str, title: str, callback, category: str = "",
                 shortcut: str = "", keywords: tuple[str, ...] = (),
                 enabled=None) -> Command:
        cmd = Command(id, title, callback, category, shortcut,
                      tuple(keywords), enabled)
        self._commands[id] = cmd
        return cmd

    def unregister(self, id: str) -> None:
        self._commands.pop(id, None)

    def commands(self) -> list[Command]:
        return list(self._commands.values())

    def query(self, text: str, limit: int = 20) -> list[Command]:
        """Ranked matching commands; recently executed ones are boosted."""
        scored: list[tuple[float, Command]] = []
        for cmd in self._commands.values():
            if cmd.enabled is not None and not cmd.enabled():
                continue
            hay = " ".join((cmd.title, cmd.category, *cmd.keywords))
            s = fuzzy_score(text, hay)
            if s is None:
                continue
            if cmd.id in self._recent:
                s += 0.25 / (1 + self._recent.index(cmd.id))
            scored.append((s, cmd))
        scored.sort(key=lambda p: (-p[0], p[1].title))
        return [c for _, c in scored[:limit]]

    def execute(self, id: str, *args, **kwargs):
        cmd = self._commands[id]
        self._recent.insert(0, id)
        del self._recent[20:]
        return cmd.callback(*args, **kwargs)
