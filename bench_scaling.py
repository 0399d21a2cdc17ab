"""Scaling harness: rays/s at 1..N devices over the ray-sharded mesh.

Measures the full production step (ray gen + 10-surface trace + merit +
backward) from `bench.py` at power-of-two device counts and reports
per-device efficiency vs the 1-device run — the measurement BASELINE.json's
">=85% linear scaling" target is scored on. On this machine it runs on the
virtual CPU mesh (set `JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8`) or the real chip(s);
on a pod slice the same code measures ICI/DCN scaling after
`optiland_tpu.parallel.init_distributed()`.

Prints one JSON line per device count plus a final summary line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure(n_devices: int, rays: int, steps: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    from bench import build_bench_system
    from optiland_tpu.parallel import (
        make_mesh_2d,
        pad_to_multiple,
        ray_sharding_2d,
        replicated_sharding,
    )
    from optiland_tpu.trace.tracer import trace_system

    lens = build_bench_system()
    static, params = lens.build()

    n_hosts = max(jax.process_count(), 1)
    mesh = make_mesh_2d(n_hosts=n_hosts,
                        chips_per_host=n_devices // n_hosts)
    rs = ray_sharding_2d(mesh)
    ps = replicated_sharding(mesh)

    n = pad_to_multiple(rays, n_devices)
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    dt = params.cv.dtype
    batch = tuple(
        jax.device_put(jnp.asarray(a, dt), rs)
        for a in (np.zeros(n), np.zeros(n), r * np.cos(th), r * np.sin(th),
                  np.full(n, 0.5876))
    )
    params = jax.device_put(params, ps)

    def merit(params, Hx, Hy, Px, Py, w):
        hist = trace_system(static, params, Hx, Hy, Px, Py, w)
        x, y, i = hist.x[-1], hist.y[-1], hist.intensity[-1]
        wsum = jnp.sum(i) + 1e-12
        cx = jnp.sum(x * i) / wsum
        cy = jnp.sum(y * i) / wsum
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / wsum

    step = jax.jit(jax.value_and_grad(merit))
    v, g = step(params, *batch)
    jax.block_until_ready((v, g))
    t0 = time.perf_counter()
    for _ in range(steps):
        v, g = step(params, *batch)
    jax.block_until_ready((v, g))
    dt_s = (time.perf_counter() - t0) / steps
    return n / dt_s


def main():
    import jax

    n_dev = len(jax.devices())
    rays = 1 << 20 if jax.devices()[0].platform != "cpu" else 1 << 16
    results = {}
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_dev]
    for c in counts:
        rps = measure(c, rays * c)  # weak scaling: fixed rays per device
        results[c] = rps
        eff = rps / (results[1] * c)
        print(json.dumps({
            "metric": "rays_per_s", "devices": c, "value": rps,
            "per_device": rps / c, "efficiency_vs_1dev": eff,
            "platform": jax.devices()[0].platform,
        }))
    top = counts[-1]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": results[top] / (results[1] * top),
        "unit": f"fraction of linear at {top} devices",
        "vs_baseline": (results[top] / (results[1] * top)) / 0.85,
        "platform": jax.devices()[0].platform,
        "note": ("virtual CPU devices share one physical CPU - flat total "
                 "throughput is expected; ICI scaling requires real chips"
                 if jax.devices()[0].platform == "cpu" else "real chips"),
    }))


if __name__ == "__main__":
    main()
