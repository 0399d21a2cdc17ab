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


# ---------------------------------------------------------------------------
# multi-host scaffolding (SURVEY.md §2.17 / §5: mesh axes ('hosts','chips'),
# ray batches sharded over DCN x ICI, merit-gradient psums as the only
# cross-host traffic)
# ---------------------------------------------------------------------------

HOST_AXIS = "hosts"
CHIP_AXIS = "chips"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX multi-process runtime (one call per host, before
    any other JAX API). On single-process runs (or managed environments like
    Cloud TPU pods where the arguments are auto-detected) all arguments may
    be omitted; `jax.distributed.initialize` is a no-op if already
    initialized."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process / no coordinator: run with the local devices
        pass


def make_mesh_2d(n_hosts: int | None = None,
                 chips_per_host: int | None = None,
                 devices=None) -> Mesh:
    """A ('hosts', 'chips') mesh: the host axis spans DCN, the chip axis
    ICI. Ray batches are sharded over BOTH axes (the trace is elementwise in
    rays, so the factorization is free); the axis split exists so reductions
    can be staged — per-host partial sums over ICI first, then one small
    cross-host psum over DCN.
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    if chips_per_host is None:
        chips_per_host = len(devices) // n_hosts
    devices = np.asarray(devices[: n_hosts * chips_per_host]).reshape(
        n_hosts, chips_per_host)
    return Mesh(devices, (HOST_AXIS, CHIP_AXIS))


def ray_sharding_2d(mesh: Mesh) -> NamedSharding:
    """(num_rays,)-leading arrays split over hosts x chips jointly."""
    return NamedSharding(mesh, P((HOST_AXIS, CHIP_AXIS)))
