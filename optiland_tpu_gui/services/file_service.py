"""File open/save behind the GUI (reference
`optiland_gui/services/file_service.py:1-307`): optiland JSON round-trip
plus Zemax / CODE V import-export through `optiland_tpu.fileio`."""

from __future__ import annotations

import json
import os

from optiland_tpu.system.optic import Optic


class FileService:
    def __init__(self, connector):
        self.connector = connector

    def new_system(self) -> None:
        from optiland_tpu_gui.connector import _default_system

        self.connector.set_optic(_default_system())
        self.connector.filepath = None

    def open(self, path: str) -> None:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".json":
            with open(path) as f:
                optic = Optic.from_dict(json.load(f))
        elif ext == ".zmx":
            from optiland_tpu.fileio import load_zemax_file

            optic = load_zemax_file(path)
        elif ext == ".seq":
            from optiland_tpu.fileio import load_codev_file

            optic = load_codev_file(path)
        else:
            raise ValueError(f"Unsupported file type: {ext}")
        self.connector.set_optic(optic)
        self.connector.filepath = path

    def save(self, path: str | None = None) -> str:
        path = path or self.connector.filepath
        if path is None:
            raise ValueError("No file path set; use save-as")
        ext = os.path.splitext(path)[1].lower()
        optic = self.connector.get_optic()
        if ext == ".json":
            with open(path, "w") as f:
                json.dump(optic.to_dict(), f, indent=1)
        elif ext == ".zmx":
            from optiland_tpu.fileio import save_zemax_file as write_zemax_file

            write_zemax_file(optic, path)
        elif ext == ".seq":
            from optiland_tpu.fileio import save_codev_file as write_codev_file

            write_codev_file(optic, path)
        else:
            raise ValueError(f"Unsupported file type: {ext}")
        self.connector.filepath = path
        self.connector.modified = False
        self.connector.file_changed.emit()
        return path
