"""Orbax checkpointing for long-running optimization / Monte-Carlo jobs
(SURVEY.md §5 "Checkpoint / resume": the reference has only the optimizer
undo stack, `optimization/optimizer/scipy/base.py:44-112`; training-style
state checkpointing is a TPU-native addition promised there).

Saved state is a plain pytree: {"step", "x", "opt_state", "prng_key", ...}.
"""

from __future__ import annotations

import os

import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: dict) -> str:
    """Write `state` (a pytree of arrays/scalars) under
    `directory/step_<step>`; returns the path."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step:08d}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_checkpoint(directory: str) -> str | None:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory)
                   if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(directory_or_path: str, template=None):
    """Restore the newest checkpoint in a directory (or an exact path).
    `template` (optional pytree) guides structure/dtype restoration.
    Returns None when nothing is saved yet."""
    path = directory_or_path
    if not os.path.basename(path).startswith("step_"):
        path = latest_checkpoint(path)
        if path is None:
            return None
    if template is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(
            path, restore_args=ocp.checkpoint_utils.construct_restore_args(
                template))
    return _checkpointer().restore(path)


def checkpoint_step(path_or_dir: str) -> int:
    """Step number encoded in a checkpoint path."""
    base = os.path.basename(path_or_dir)
    return int(base.split("_")[1]) if base.startswith("step_") else -1


def prng_to_state(key) -> np.ndarray:
    """PRNG keys serialize as their raw uint32 data."""
    import jax.random as jr

    return np.asarray(jr.key_data(key))


def state_to_prng(data):
    import jax.numpy as jnp
    import jax.random as jr

    return jr.wrap_key_data(jnp.asarray(data, jnp.uint32))
