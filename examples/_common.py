"""Shared helpers for the example gallery: headless-safe figure saving."""

from __future__ import annotations

import os
import pathlib

import matplotlib

matplotlib.use("Agg")


def maybe_save(fig, name: str) -> None:
    """Save `fig` next to the examples when OPTILAND_TPU_SAVE_FIGS=1."""
    import matplotlib.pyplot as plt

    if os.environ.get("OPTILAND_TPU_SAVE_FIGS") == "1":
        out = pathlib.Path(__file__).parent / "output"
        out.mkdir(exist_ok=True)
        fig.savefig(out / name, dpi=120, bbox_inches="tight")
        print(f"saved {out / name}")
    plt.close(fig)
