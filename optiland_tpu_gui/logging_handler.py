"""GUI logging bridge (reference
`optiland_gui/utils/logging_handler.py:1-68`): a `logging.Handler` that
appends formatted records to a bounded in-memory model with change
listeners, feeding the console/log panel; headless by construction."""

from __future__ import annotations

import logging

from optiland_tpu_gui.connector import Signal


class GuiLogHandler(logging.Handler):
    """Ring-buffer log sink; the log panel subscribes to `record_added`."""

    def __init__(self, capacity: int = 1000, level=logging.INFO):
        super().__init__(level)
        self.capacity = capacity
        self.records: list[tuple[str, str]] = []  # (levelname, message)
        self.record_added = Signal()
        self.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s",
            datefmt="%H:%M:%S"))

    def emit(self, record: logging.LogRecord) -> None:
        try:
            msg = self.format(record)
        except Exception:
            msg = record.getMessage()
        self.records.append((record.levelname, msg))
        del self.records[:-self.capacity]
        self.record_added.emit(record.levelname, msg)

    # -- panel queries ---------------------------------------------------
    def tail(self, n: int = 100, min_level: int = logging.NOTSET
             ) -> list[str]:
        names = {logging.getLevelName(lv) for lv in
                 (logging.DEBUG, logging.INFO, logging.WARNING,
                  logging.ERROR, logging.CRITICAL)
                 if lv >= min_level}
        return [m for lv, m in self.records if lv in names][-n:]

    def clear(self) -> None:
        self.records.clear()


def install(logger_name: str = "optiland_tpu",
            capacity: int = 1000) -> GuiLogHandler:
    """Attach a GuiLogHandler to the package logger and return it."""
    handler = GuiLogHandler(capacity)
    logger = logging.getLogger(logger_name)
    logger.addHandler(handler)
    if logger.level == logging.NOTSET:
        # without this the root logger's WARNING default would swallow the
        # INFO records the console panel wants
        logger.setLevel(handler.level)
    return handler
