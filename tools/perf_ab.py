"""Interleaved A/B: old per-ray-output merit vs fused-moments merit.
Interleaving A,B,A,B controls for chip-tenant drift between minutes."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from bench import build_bench_system
    from optiland_tpu.optimization.merits import centroid_rms_spot
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

    def merit_old(params, Hx, Hy, Px, Py):
        out = trace_system_final(static, params, Hx, Hy, Px, Py, w,
                                 outputs=("x", "y", "intensity"))
        x, y, i = out["x"], out["y"], out["intensity"]
        wsum = jnp.sum(i) + 1e-6
        cx = jnp.sum(x * i) / wsum
        cy = jnp.sum(y * i) / wsum
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / wsum

    def merit_new(params, Hx, Hy, Px, Py):
        return centroid_rms_spot(static, params, Hx, Hy, Px, Py, w)

    def make_unrolled(merit, k):
        def f(p, a, b, c, d):
            acc = 0.0
            for _ in range(k):
                loss, g = jax.value_and_grad(merit)(p, a, b, c, d)
                gs = sum(jnp.sum(v) for v in jtu.tree_leaves(g))
                p = jtu.tree_map(
                    lambda x: x * (1.0 + 1e-9 * jnp.tanh(gs.astype(x.dtype))),
                    p)
                acc = acc + loss
            return acc
        return jax.jit(f)

    K1, K2 = 2, 12
    fns = {}
    for name, m in (("old", merit_old), ("new", merit_new)):
        fns[name] = (make_unrolled(m, K1), make_unrolled(m, K2))
        # compile both now
        for f in fns[name]:
            np.asarray(f(params, Hx, Hy, Px, Py))

    import collections
    best = collections.defaultdict(lambda: [np.inf, np.inf])
    for rep in range(6):
        for name in ("old", "new"):
            f1, f2 = fns[name]
            p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12 * (rep + 1)),
                              params)
            t0 = time.perf_counter()
            np.asarray(f1(p2, Hx, Hy, Px, Py))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f2(p2, Hx, Hy, Px, Py))
            t2 = time.perf_counter() - t0
            best[name][0] = min(best[name][0], t1)
            best[name][1] = min(best[name][1], t2)

    for name in ("old", "new"):
        t1, t2 = best[name]
        dt = (t2 - t1) / (K2 - K1)
        print(f"{name}: {dt*1e3:7.3f} ms/step -> {N/dt/1e6:7.1f} M rays/s",
              flush=True)


if __name__ == "__main__":
    main()
