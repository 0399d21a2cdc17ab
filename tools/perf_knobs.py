"""Measure fwd-only and fwd+bwd per-step device time of the bench system
with bench.py's honest unrolled-slope methodology, for kernel-knob tuning.

Usage: python tools/perf_knobs.py [TR_BWD] [SUB_BWD]
Optionally overrides fused-kernel tile knobs via env before import.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    if len(sys.argv) > 1:
        import optiland_tpu.trace.fused as fused
        fused._TR_BWD = int(sys.argv[1])
        if len(sys.argv) > 2:
            fused._SUB_BWD = int(sys.argv[2])

    from bench import build_bench_system
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

    def merit(params, Hx, Hy, Px, Py):
        out = trace_system_final(static, params, Hx, Hy, Px, Py, w,
                                 outputs=("x", "y", "intensity"))
        x, y, i = out["x"], out["y"], out["intensity"]
        wsum = jnp.sum(i) + 1e-6
        cx = jnp.sum(x * i) / wsum
        cy = jnp.sum(y * i) / wsum
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / wsum

    def make_unrolled(k, with_grad):
        def f(p, a, b, c, d):
            acc = 0.0
            for _ in range(k):
                if with_grad:
                    loss, g = jax.value_and_grad(merit)(p, a, b, c, d)
                    gs = sum(jnp.sum(v) for v in jtu.tree_leaves(g))
                else:
                    loss = merit(p, a, b, c, d)
                    gs = loss
                p = jtu.tree_map(
                    lambda x: x * (1.0 + 1e-9 * jnp.tanh(gs.astype(x.dtype))),
                    p)
                acc = acc + loss
            return acc
        return jax.jit(f)

    K1, K2, REPS = 2, 12, 4

    def timed(f):
        out = np.asarray(f(params, Hx, Hy, Px, Py))
        assert np.isfinite(out)
        best = np.inf
        for i in range(REPS):
            p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12 * (i + 1)), params)
            t0 = time.perf_counter()
            np.asarray(f(p2, Hx, Hy, Px, Py))
            best = min(best, time.perf_counter() - t0)
        return best

    for label, wg in (("fwd", False), ("fwd+bwd", True)):
        t1 = timed(make_unrolled(K1, wg))
        t2 = timed(make_unrolled(K2, wg))
        dt = (t2 - t1) / (K2 - K1)
        print(f"{label}: {dt*1e3:.3f} ms/step  -> {N/dt/1e6:.1f} M rays/s")


if __name__ == "__main__":
    main()
