"""Measure the per-step cost of the non-kernel prologue of the bench step:
_raygen_scalars (paraxial EPL/EPD scans) + _uniform_tables (dispersion
hoisting) + the moments->loss epilogue. If lax.scan's per-iteration
overhead on this platform bites, it bites here."""
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
    from optiland_tpu.trace.fused import _raygen_scalars, _uniform_tables

    lens = build_bench_system()
    static, params = lens.build()
    w = 0.5876

    def prologue(params):
        rg = _raygen_scalars(static, params)
        n_table, alpha_table = _uniform_tables(static, params, w)
        return jnp.sum(rg) + jnp.sum(n_table) + jnp.sum(alpha_table)

    def make_unrolled(k):
        def f(p):
            acc = 0.0
            for _ in range(k):
                v = prologue(p)
                p = jtu.tree_map(
                    lambda x: x * (1.0 + 1e-9 * jnp.tanh(v.astype(x.dtype))),
                    p)
                acc = acc + v
            return acc
        return jax.jit(f)

    K1, K2, REPS = 2, 12, 4

    def timed(f):
        out = np.asarray(f(params))
        assert np.isfinite(out)
        best = np.inf
        for i in range(REPS):
            p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12 * (i + 1)), params)
            t0 = time.perf_counter()
            np.asarray(f(p2))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(make_unrolled(K1))
    t2 = timed(make_unrolled(K2))
    dt = (t2 - t1) / (K2 - K1)
    print(f"prologue (+grad-free): {dt*1e3:.3f} ms/step")

    # with gradient (as the real step differentiates through it)
    def make_unrolled_grad(k):
        def f(p):
            acc = 0.0
            for _ in range(k):
                v, g = jax.value_and_grad(prologue)(p)
                gs = sum(jnp.sum(x) for x in jtu.tree_leaves(g))
                p = jtu.tree_map(
                    lambda x: x * (1.0 + 1e-9 *
                                   jnp.tanh(gs.astype(x.dtype))), p)
                acc = acc + v
            return acc
        return jax.jit(f)

    t1 = timed(make_unrolled_grad(K1))
    t2 = timed(make_unrolled_grad(K2))
    dt = (t2 - t1) / (K2 - K1)
    print(f"prologue (fwd+bwd):    {dt*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
