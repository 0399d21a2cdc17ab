"""Probe 2: what inside ray-gen costs 10ms; scalar-chain vs vectorized."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import build_bench_system
from optiland_tpu.system import paraxial as px
from optiland_tpu.trace.raygen import generate_rays, vignetting_factors


def timeit(fn, *args, iters=20):
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

    t = timeit(jax.jit(lambda p: (px.EPL(static, p), px.EPD(static, p))),
               params)
    print(f"EPL+EPD scalars: {t*1e3:.3f} ms")

    t = timeit(jax.jit(lambda p: vignetting_factors(static, p, Hx, Hy)),
               params)
    print(f"vignetting (N-sized): {t*1e3:.3f} ms")

    t = timeit(jax.jit(
        lambda p: generate_rays(static, p, Hx, Hy, Px, Py, w)), params)
    print(f"generate_rays full: {t*1e3:.3f} ms")

    # raw elementwise op of same size for bandwidth reference
    t = timeit(jax.jit(lambda a, b: a * b + jnp.sqrt(jnp.abs(a)) + b * b),
               Px, Py)
    print(f"reference elementwise (3 arrays io): {t*1e3:.3f} ms")

    # single-surface step cost: conic intersect + refract on 2M rays
    from optiland_tpu.core.rays import make_rays
    from optiland_tpu.core import rays as R
    from optiland_tpu.geometry.surfaces import intersect, surface_normal

    rays0 = jax.jit(lambda p: generate_rays(static, p, Hx, Hy, Px, Py, w))(
        params)

    def one_surface(p, rays):
        k = 3
        t_, valid = intersect(1, 0, rays.x, rays.y, rays.z, rays.L, rays.M,
                              rays.N, p.cv[k], p.conic[k], p.coeffs[k])
        rays = R.propagate(rays, t_)
        nx, ny, nz = surface_normal(1, 0, rays.x, rays.y, p.cv[k],
                                    p.conic[k], p.coeffs[k])
        return R.refract(rays, nx, ny, nz, 1.0, 1.6)

    t = timeit(jax.jit(one_surface), params, rays0)
    print(f"single conic surface step: {t*1e3:.3f} ms")



if __name__ == "__main__":
    main()
