"""Round-4 sweep after the IFT-conic adjoint: vary TR_FWD / (TR_BWD,
SUB_BWD) independently, measure fwd+bwd with the honest slope method."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    import optiland_tpu.trace.fused as fused
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

    K1, K2, REPS = 2, 12, 3

    def run_config(tr_fwd, sub_fwd, tr_bwd, sub_bwd):
        fused._TR_FWD = tr_fwd
        fused._SUB = sub_fwd
        fused._TR_BWD = tr_bwd
        fused._SUB_BWD = sub_bwd

        def make_unrolled(k):
            def f(p, a, b, c, d):
                acc = 0.0
                for _ in range(k):
                    loss, g = jax.value_and_grad(merit)(p, a, b, c, d)
                    gs = sum(jnp.sum(v) for v in jtu.tree_leaves(g))
                    p = jtu.tree_map(
                        lambda x: x * (1.0 + 1e-9 *
                                       jnp.tanh(gs.astype(x.dtype))), p)
                    acc = acc + loss
                return acc
            return jax.jit(f)

        def timed(f):
            out = np.asarray(f(params, Hx, Hy, Px, Py))
            assert np.isfinite(out), out
            best = np.inf
            for i in range(REPS):
                p2 = jtu.tree_map(
                    lambda a: a * (1.0 + 1e-12 * (i + 1)), params)
                t0 = time.perf_counter()
                np.asarray(f(p2, Hx, Hy, Px, Py))
                best = min(best, time.perf_counter() - t0)
            return best

        t1 = timed(make_unrolled(K1))
        t2 = timed(make_unrolled(K2))
        return (t2 - t1) / (K2 - K1)

    CONFIGS = [
        (128, 32, 64, 32),    # current defaults (post-IFT baseline)
        (128, 32, 128, 64),   # best bwd combo from sweep 1
        (256, 32, 64, 32),    # bigger fwd tile
        (128, 32, 128, 32),   # bigger bwd tile, same chunk
        (256, 64, 128, 64),   # big tiles, 2-vreg... 64-row chunks
    ]
    for cfg in CONFIGS:
        try:
            dt = run_config(*cfg)
            print(f"FWD({cfg[0]},{cfg[1]}) BWD({cfg[2]},{cfg[3]}): "
                  f"{dt*1e3:7.3f} ms/step -> {N/dt/1e6:7.1f} M rays/s",
                  flush=True)
        except Exception as e:
            print(f"{cfg}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
