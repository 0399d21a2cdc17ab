"""Device-mesh helpers: ray-batch sharding over a TPU slice.

The reference has no distributed layer (SURVEY.md §2.17 — its only
parallelism is array vectorization and Numba threads). The TPU-native design
scales by sharding the *ray batch* over a `jax.sharding.Mesh`:

  - every trace quantity is elementwise in the ray axis, so a trace over
    sharded inputs runs with zero communication;
  - lens parameters are KBs — replicated everywhere;
  - reductions (merit sums, centroids, Monte-Carlo statistics, merit
    *gradients* w.r.t. the replicated params) trigger XLA-inserted psums
    over ICI, which is exactly the "all-reduce overlapped with backward"
    in BASELINE.json's north star.

On multi-host slices the same code scales by building the mesh over all
processes (`jax.distributed.initialize` first); the ray axis then spans
DCN x ICI and only the scalar reductions cross hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ray-batch axis.

    A lens prescription is tiny and every hot loop is elementwise over rays,
    so a single flat axis is the right topology at any scale — there is no
    tensor/pipeline dimension to trade off (SURVEY.md §5).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (num_rays,)-leading arrays: split over the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for lens parameters: replicated on every device."""
    return NamedSharding(mesh, P())


def shard_rays(mesh: Mesh, tree):
    """Place a pytree of (num_rays, ...) arrays with the ray axis sharded.

    Ray counts must be padded to a multiple of the mesh size (trace inputs
    have static shapes anyway; pad with intensity-0 rays which are ignored by
    every analysis reduction).
    """
    sh = ray_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n."""
    return ((n + m - 1) // m) * m
