"""Y-Ybar diagram (reference `analysis/y_ybar.py:26-110`)."""

from __future__ import annotations

import numpy as np


class YYbar:
    """Marginal vs chief paraxial ray heights per surface."""

    def __init__(self, optic, wavelength="primary"):
        self.optic = optic
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.wavelength = float(wavelength)
        ya, _ = optic.paraxial.marginal_ray(self.wavelength)
        yb, _ = optic.paraxial.chief_ray(self.wavelength)
        self.data = {"ya": ya.ravel(), "yb": yb.ravel()}

    def view(self, figsize=(7, 5.5)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        ya = np.asarray(self.data["ya"])
        yb = np.asarray(self.data["yb"])
        ax.plot(yb, ya, "o-")
        for i, (xb, xa) in enumerate(zip(yb, ya)):
            ax.annotate(str(i), (xb, xa))
        ax.set_xlabel("Chief ray height")
        ax.set_ylabel("Marginal ray height")
        ax.grid(True)
        return fig, ax
