"""Scaling harness: the sharded production step across a device mesh.

What is measurable on THIS machine (VERDICT r2 item 3):

- The 8 "devices" of the test mesh are virtual XLA CPU devices sharing one
  2-core host, so aggregate FLOPs cannot scale with device count. What CAN
  be measured there is the *overhead of the sharded program*: run the SAME
  total ray batch at 1/2/4/8 virtual devices and compare step times. With
  zero partition/collective overhead the times are equal (same silicon);
  efficiency := T(1 dev) / T(N dev). This isolates exactly the term that
  ICI would add on a pod: GSPMD partitioning + psum of the merit gradients.
- The real chip provides the absolute 1-device rays/s anchor (bench.py's
  honest methodology; see PERF.md for why naive timing lies on the
  tunneled platform).

On a real pod slice the same script (after
`optiland_tpu.parallel.init_distributed()`) measures true weak scaling —
`--weak` switches to fixed rays *per device*.

Writes SCALING_rNN.json (one dict with all measurements) when run with
`--out SCALING_r03.json`; also prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(n_devices: int, rays: int, steps: int = 8) -> float:
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
    float(v)  # host readback: a true barrier on every platform
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            v, g = step(params, *batch)
        float(v)
        jax.block_until_ready(g)
        best = min(best, (time.perf_counter() - t0) / steps)
    return n / best


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--weak", action="store_true",
                    help="fixed rays PER DEVICE (real multi-chip scaling)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    n_dev = len(jax.devices())
    rays = 1 << 20 if platform != "cpu" else 1 << 16

    lines = []
    results = {}
    counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n_dev]
    for c in counts:
        rps = measure(c, rays * c if args.weak else rays)
        results[c] = rps
        if args.weak:
            eff = rps / (results[1] * c)
        else:
            eff = rps / results[1]  # fixed work: T(1)/T(c)
        line = {
            "metric": "rays_per_s", "devices": c, "value": rps,
            "mode": "weak" if args.weak else "fixed_total_work",
            "efficiency": eff, "platform": platform,
        }
        lines.append(line)
        print(json.dumps(line))

    top = counts[-1]
    summary = {
        "metric": "sharding_overhead_efficiency" if not args.weak
        else "weak_scaling_efficiency",
        "value": lines[-1]["efficiency"],
        "unit": f"fraction at {top} devices",
        "vs_baseline": lines[-1]["efficiency"] / 0.85,
        "platform": platform,
        "note": (
            "virtual CPU devices share one physical host: fixed-total-work "
            "efficiency isolates GSPMD partition + gradient-psum overhead "
            "(the term ICI adds on a pod); aggregate-FLOP scaling needs "
            "real chips" if platform == "cpu" else "real chips"),
    }
    lines.append(summary)
    print(json.dumps(summary))

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"measurements": lines}, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
