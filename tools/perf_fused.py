"""Fused-kernel TPU check: grad parity vs XLA + throughput comparison."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import build_bench_system
from optiland_tpu.trace.fused import trace_final
from optiland_tpu.trace.raygen import generate_rays
from optiland_tpu.trace.tracer import trace_rays


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
    Px = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Py = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Hy = jnp.asarray(rng.uniform(-1, 1, N).astype(np.float32))
    Hx = jnp.zeros_like(Hy)
    w = jnp.full((N,), 0.5876, jnp.float32)
    rays0 = jax.jit(lambda p: generate_rays(static, p, Hx, Hy, Px, Py, w))(
        params)
    rays0 = jax.lax.stop_gradient(rays0)

    def spot(x, y, i):
        s = jnp.sum(i)
        cx = jnp.sum(x * i) / s
        cy = jnp.sum(y * i) / s
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / s

    def merit_fused(p):
        out = trace_final(static, p, rays0)
        return spot(out["x"], out["y"], out["intensity"])

    def merit_xla(p):
        h = trace_rays(static, p, rays0)
        return spot(h.x[-1], h.y[-1], h.intensity[-1])

    # correctness: values + grads on a small slice
    vf = jax.jit(merit_fused)(params)
    vx = jax.jit(merit_xla)(params)
    print(f"merit fused={float(vf):.8f} xla={float(vx):.8f}")

    gf = jax.jit(jax.grad(merit_fused))(params)
    gx = jax.jit(jax.grad(merit_xla))(params)
    for name in ("cv", "conic", "coeffs", "thickness"):
        a = np.asarray(getattr(gf, name))
        b = np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-9)
        print(f"grad {name}: max rel diff {np.abs(a - b).max() / scale:.2e}")

    # throughput
    t = timeit(jax.jit(merit_fused), params)
    print(f"fused fwd: {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")
    t = timeit(jax.jit(merit_xla), params)
    print(f"xla fwd:   {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")
    t = timeit(jax.jit(jax.value_and_grad(merit_fused)), params)
    print(f"fused fwd+bwd: {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")
    t = timeit(jax.jit(jax.value_and_grad(merit_xla)), params)
    print(f"xla fwd+bwd:   {t*1e3:.2f} ms -> {N/t/1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
