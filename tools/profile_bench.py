"""Honest device-time breakdown of the bench step on the real chip.

Methodology: each measured quantity runs as a chained `lax.scan` INSIDE one
jit call, with the loop carry feeding each step's params from the previous
step's result — so the device must execute every step (the tunneled runtime
was observed to coalesce repeated identical dispatches, which makes naive
Python timing loops report fantasy numbers). Wall time of the scan / its
length = true per-step device time.

Drives VERDICT r2 item 1 / missing #6; results recorded in PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

ITERS = 20


def chain_time(make_body, params, *data):
    """Time ITERS chained executions of `body(params, *data) -> pytree` with
    a forced sequential dependency through params."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    def scan_fn(params, *data):
        def body(p, _):
            out = make_body(p, *data)
            # fold a scalar of the output back into params: serializes steps.
            # The 1e-30 coupling is numerically a no-op but NOT foldable —
            # a 0.0 multiplier here gets constant-folded and the whole scan
            # body DCE'd (measured: "0.007 ms" steps).
            s = sum(jnp.sum(x) for x in jtu.tree_leaves(out))
            p2 = jtu.tree_map(lambda a: a + 1e-30 * s.astype(a.dtype), p)
            return p2, s
        _, ss = jax.lax.scan(body, params, None, length=ITERS)
        return ss

    f = jax.jit(scan_fn)
    # NOTE: np.asarray readback, NOT block_until_ready — the tunneled
    # runtime's ready events fire before execution completes, and it also
    # dedupes repeated identical dispatches (hence the perturbed params on
    # the timed call).
    np.asarray(f(params, *data))
    p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12), params)
    t0 = time.perf_counter()
    np.asarray(f(p2, *data))
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_bench_system
    from optiland_tpu.trace.fused import trace_final
    from optiland_tpu.trace.raygen import generate_rays
    from optiland_tpu.trace.tracer import trace_system_final

    lens = build_bench_system()
    static, params = lens.build()

    N = 2_000_000
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=N)).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, size=N).astype(np.float32)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    Hy = jnp.asarray(rng.uniform(-1, 1, size=N).astype(np.float32))
    Hx = jnp.zeros_like(Hy)
    w = 0.5876

    res = {}

    res["raygen_ms"] = chain_time(
        lambda p, a, b, c, d: generate_rays(static, p, a, b, c, d, w),
        params, Hx, Hy, Px, Py) * 1e3

    rays0 = jax.block_until_ready(
        jax.jit(lambda p, a, b, c, d: generate_rays(static, p, a, b, c, d, w))
        (params, Hx, Hy, Px, Py))
    res["fwd_kernel_ms"] = chain_time(
        lambda p, r0: trace_final(static, p, r0, wavelength=w),
        params, rays0) * 1e3

    def merit(p, a, b, c, d):
        out = trace_system_final(static, p, a, b, c, d, w)
        x, y, i = out["x"], out["y"], out["intensity"]
        wsum = jnp.sum(i) + 1e-6
        cx = jnp.sum(x * i) / wsum
        cy = jnp.sum(y * i) / wsum
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / wsum

    res["merit_fwd_ms"] = chain_time(merit, params, Hx, Hy, Px, Py) * 1e3
    res["fwd_bwd_ms"] = chain_time(
        lambda p, a, b, c, d: jax.value_and_grad(merit)(p, a, b, c, d),
        params, Hx, Hy, Px, Py) * 1e3

    res["rays_per_s_fwd"] = N / (res["merit_fwd_ms"] / 1e3)
    res["rays_per_s_fwd_bwd"] = N / (res["fwd_bwd_ms"] / 1e3)
    res["bwd_only_ms"] = res["fwd_bwd_ms"] - res["merit_fwd_ms"]
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
