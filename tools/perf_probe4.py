"""Probe 4: backward-pass structure — raygen-in-graph cost, remat, iters."""

import time
from dataclasses import replace as dreplace

import numpy as np

import jax
import jax.numpy as jnp

from bench import build_bench_system
from optiland_tpu.trace.raygen import generate_rays
from optiland_tpu.trace.tracer import trace_rays, trace_system


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def spot_merit(hist):
    x, y, i = hist.x[-1], hist.y[-1], hist.intensity[-1]
    s = jnp.sum(i)
    cx = jnp.sum(x * i) / s
    cy = jnp.sum(y * i) / s
    return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / s


def main():
    lens = build_bench_system()
    static, params = lens.build()
    N = 2_000_000
    rng = np.random.default_rng(0)
    Px = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Py = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Hy = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Hx = jnp.zeros_like(Hy)
    w = jnp.full((N,), 0.5876, jnp.float32)

    # (a) full pipeline, newton 16 (baseline)
    def m_full(p):
        return spot_merit(trace_system(static, p, Hx, Hy, Px, Py, w))

    t = timeit(jax.jit(jax.value_and_grad(m_full)), params)
    print(f"full fwd+bwd (iters=16): {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")

    # (b) trace only (fixed rays0, no raygen grads)
    rays0 = jax.jit(lambda p: generate_rays(static, p, Hx, Hy, Px, Py, w))(
        params)
    rays0 = jax.lax.stop_gradient(rays0)

    def m_trace(p):
        return spot_merit(trace_rays(static, p, rays0))

    t = timeit(jax.jit(jax.value_and_grad(m_trace)), params)
    print(f"trace-only fwd+bwd: {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")

    # (c) newton 8
    st8 = dreplace(static, newton_iters=8)

    def m8(p):
        return spot_merit(trace_system(st8, p, Hx, Hy, Px, Py, w))

    t = timeit(jax.jit(jax.value_and_grad(m8)), params)
    print(f"full fwd+bwd (iters=8): {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")

    # (d) f32 vs accuracy: value diff between 8 and 16 iters
    v16 = jax.jit(m_full)(params)
    v8 = jax.jit(m8)(params)
    print(f"merit iters=16 {float(v16):.8f} vs iters=8 {float(v8):.8f}")


if __name__ == "__main__":
    main()
