"""Probe 3: scale N to split per-call overhead from per-ray device cost."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import build_bench_system
from optiland_tpu.trace.tracer import trace_system


def main():
    lens = build_bench_system()
    static, params = lens.build()

    for N in (1_000_000, 8_000_000):
        rng = np.random.default_rng(0)
        Px = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
        Py = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
        Hy = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
        Hx = jnp.zeros_like(Hy)
        w = jnp.full((N,), 0.5876, jnp.float32)

        def merit(params):
            hist = trace_system(static, params, Hx, Hy, Px, Py, w)
            x, y, i = hist.x[-1], hist.y[-1], hist.intensity[-1]
            s = jnp.sum(i)
            cx = jnp.sum(x * i) / s
            cy = jnp.sum(y * i) / s
            return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / s

        vg = jax.jit(jax.value_and_grad(merit))
        out = vg(params)
        jax.tree.leaves(out)[0].block_until_ready()
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            out = vg(params)
        jax.tree.leaves(out)[0].block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"N={N/1e6:.0f}M: {dt*1e3:.2f} ms -> {N/dt/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
