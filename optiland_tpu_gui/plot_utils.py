"""Matplotlib theming for embedded GUI plots (reference
`optiland_gui/gui_plot_utils.py`: applies the active Qt theme's colors to
analysis figures). Pure matplotlib — no Qt dependency."""

from __future__ import annotations

from optiland_tpu_gui.settings import THEMES


def rc_params(theme: str) -> dict:
    """Matplotlib rcParams matching a GUI theme."""
    t = THEMES.get(theme, THEMES["dark"])
    return {
        "figure.facecolor": t["panel_bg"],
        "axes.facecolor": t["panel_bg"],
        "axes.edgecolor": t["grid"],
        "axes.labelcolor": t["text"],
        "text.color": t["text"],
        "xtick.color": t["text"],
        "ytick.color": t["text"],
        "grid.color": t["grid"],
        "axes.prop_cycle": __import__("cycler").cycler(
            color=[t["accent"], "#d97757", "#5fb36a", "#c7a23c",
                   "#9467bd", "#8c564b"]),
    }


def apply_theme(fig, theme: str) -> None:
    """Restyle an existing figure in place to match the GUI theme."""
    t = THEMES.get(theme, THEMES["dark"])
    fig.patch.set_facecolor(t["panel_bg"])
    for ax in fig.get_axes():
        ax.set_facecolor(t["panel_bg"])
        ax.title.set_color(t["text"])
        ax.xaxis.label.set_color(t["text"])
        ax.yaxis.label.set_color(t["text"])
        ax.tick_params(colors=t["text"])
        for spine in ax.spines.values():
            spine.set_color(t["grid"])
        legend = ax.get_legend()
        if legend is not None:
            legend.get_frame().set_facecolor(t["panel_bg"])
            for txt in legend.get_texts():
                txt.set_color(t["text"])


def themed_figure(theme: str, **kw):
    """Create a new figure with the theme's rcParams applied."""
    import matplotlib.pyplot as plt

    with plt.rc_context(rc_params(theme)):
        fig = plt.figure(**kw)
    apply_theme(fig, theme)
    return fig
