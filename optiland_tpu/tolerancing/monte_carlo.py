"""Monte-Carlo tolerancing: vmapped + mesh-sharded perturbation batches.

The reference runs draws in a serial Python loop re-optimizing each time
(`tolerancing/monte_carlo.py:60-124`). Here `run(N)` evaluates every draw in
one jitted vmap; with a mesh, draws shard across devices (each evaluates its
slice; the pandas summary gathers once at the end) — a million-draw MC is a
few device launches.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.tolerancing.core import Tolerancing


class MonteCarlo:
    def __init__(self, tolerancing: Tolerancing, mesh=None):
        self.tol = tolerancing
        self.mesh = mesh
        self._results = None

    def run(self, num_iterations: int, seed: int = 0):
        """Evaluate all draws; returns a pandas DataFrame like the reference
        (perturbation columns, compensator columns, operand columns)."""
        import pandas as pd

        draws = self.tol.draw_table(num_iterations, seed)
        c = self.tol._compile()
        draws_j = jnp.asarray(draws)
        params = self.tol._nominal_params

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = self.mesh.devices.size
            pad = (-num_iterations) % n_dev
            if pad:
                draws_j = jnp.concatenate([draws_j, draws_j[:pad]], axis=0)
            draws_j = jax.device_put(
                draws_j, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
            )

        values, comp_x = c["pipeline_batch"](params, draws_j)
        values = np.asarray(values)[:num_iterations]
        comp_x = np.asarray(comp_x)[:num_iterations]

        data = {}
        for j, p in enumerate(self.tol.perturbations):
            data[f"P{j}: {p}"] = draws[:, j]
        for j, v in enumerate(self.tol.compensators):
            vals = np.asarray(
                [float(v.scaler.inverse_scale(x)) for x in comp_x[:, j]]
            )
            data[f"C{j}: {v}"] = vals
        for j, o in enumerate(self.tol.operands):
            data[f"{j}: {o.operand_type}"] = values[:, j]
        self._results = pd.DataFrame(data)
        return self._results

    @property
    def results(self):
        return self._results

    def view_histogram(self, bins: int = 30, figsize=(10, 6)):
        import matplotlib.pyplot as plt

        cols = [c for c in self._results.columns if not c.startswith(("P", "C"))]
        fig, axs = plt.subplots(1, len(cols), figsize=figsize, squeeze=False)
        for ax, col in zip(axs[0], cols):
            ax.hist(self._results[col], bins=bins)
            ax.set_title(col)
        fig.tight_layout()
        return fig, axs

    def view_cdf(self, figsize=(10, 6)):
        import matplotlib.pyplot as plt

        cols = [c for c in self._results.columns if not c.startswith(("P", "C"))]
        fig, axs = plt.subplots(1, len(cols), figsize=figsize, squeeze=False)
        for ax, col in zip(axs[0], cols):
            v = np.sort(self._results[col])
            ax.plot(v, np.linspace(0, 1, len(v)))
            ax.set_title(col)
            ax.set_ylabel("CDF")
        fig.tight_layout()
        return fig, axs
