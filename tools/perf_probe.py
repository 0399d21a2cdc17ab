"""Perf probes for the bench system on real TPU: timing variants to find
the bottleneck (fwd vs bwd, newton iters, ray-gen, dtype audit)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import build_bench_system
from optiland_tpu.trace.tracer import trace_rays, trace_system
from optiland_tpu.trace.raygen import generate_rays


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
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
    w = jnp.full((N,), 0.5876, jnp.float32)

    def merit_full(params):
        hist = trace_system(static, params, Hx, Hy, Px, Py, w)
        x, y, i = hist.x[-1], hist.y[-1], hist.intensity[-1]
        s = jnp.sum(i)
        cx = jnp.sum(x * i) / s
        cy = jnp.sum(y * i) / s
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / s

    # dtype audit
    hist = jax.eval_shape(lambda p: trace_system(static, p, Hx, Hy, Px, Py, w),
                          params)
    print("history dtypes:", {k: v.dtype for k, v in hist.__dict__.items()
                              if v is not None})

    fwd = jax.jit(merit_full)
    t = timeit(fwd, params)
    print(f"fwd merit: {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")

    vg = jax.jit(jax.value_and_grad(merit_full))
    t = timeit(vg, params)
    print(f"fwd+bwd merit: {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")

    # ray-gen alone
    rg = jax.jit(lambda p: generate_rays(static, p, Hx, Hy, Px, Py, w))
    t = timeit(rg, params)
    print(f"ray-gen only: {t*1e3:.2f} ms")

    # trace alone (pre-generated rays)
    rays0 = rg(params)
    tr = jax.jit(lambda p, r0: trace_rays(static, p, r0))

    def merit_of_trace(p, r0):
        h = tr(p, r0)
        return jnp.sum(h.x[-1] ** 2)

    t = timeit(jax.jit(merit_of_trace), params, rays0)
    print(f"trace-only fwd (sum merit): {t*1e3:.2f} ms")

    # newton iters sweep
    for it in (4, 8, 16):
        from dataclasses import replace as dreplace

        st2 = dreplace(static, newton_iters=it)

        def m2(p):
            h = trace_system(st2, p, Hx, Hy, Px, Py, w)
            return jnp.sum(h.x[-1] ** 2 + h.y[-1] ** 2)

        t = timeit(jax.jit(jax.value_and_grad(m2)), params)
        print(f"newton_iters={it}: fwd+bwd {t*1e3:.2f} ms -> "
              f"{N/t/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
