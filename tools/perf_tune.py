"""Interleaved tile-constant sweep for the fused kernel.

Each config compiles its own jitted chained-step functions under
monkeypatched `trace/fused.py` tile constants (read at trace time), then
all configs are timed interleaved (min over reps) so chip-tenant drift
between minutes cannot bias one config. Honest K-slope methodology from
bench.py / PERF.md.

Usage: python tools/perf_tune.py [fwd|fwdbwd]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

# keep the sweep small: compiling each config's chained-step function over
# the tunnel costs minutes; sweep in stages (stage 2 refines around the
# stage-1 winner by editing this list)
# stage 3 (confirmation): stage 2 measured TRF=256 (+1.9%) and SUB=64
# (+2.1%) each beating base; confirm the combination before adopting
CONFIGS = [
    # label, overrides on optiland_tpu.trace.fused
    ("base  TRF=128 SUB=32", {}),
    ("TRF=256 SUB=64", {"_TR_FWD": 256, "_SUB": 64}),
    ("TRF=256 SUB=32", {"_TR_FWD": 256}),
    ("TRF=128 SUB=64", {"_SUB": 64}),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fwdbwd"
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from bench import build_bench_system
    from optiland_tpu.optimization.merits import centroid_rms_spot
    from optiland_tpu.trace import fused

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
        return centroid_rms_spot(static, params, Hx, Hy, Px, Py, w)

    def make_unrolled(k, use_grad):
        def f(p, a, b, c, d):
            acc = 0.0
            for _ in range(k):
                if use_grad:
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

    K1, K2 = 2, 6
    # many interleaved reps: min-of-N is only a consistent estimator of the
    # per-config quiet-window time if N spans several tenant-drift windows
    # (PERF.md round-4: REPS=5 produced contradictory rankings)
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    use_grad = mode == "fwdbwd"

    defaults = {k: getattr(fused, k)
                for k in ("_TR_FWD", "_TR_BWD", "_SUB", "_SUB_BWD")}
    fns = {}
    for label, over in CONFIGS:
        for k, v in defaults.items():
            setattr(fused, k, v)
        for k, v in over.items():
            setattr(fused, k, v)
        f1, f2 = make_unrolled(K1, use_grad), make_unrolled(K2, use_grad)
        try:
            for ki, f in ((K1, f1), (K2, f2)):
                t0 = time.perf_counter()
                out = np.asarray(f(params, Hx, Hy, Px, Py))
                assert np.isfinite(out), label
                print(f"compiled {label} K={ki} in "
                      f"{time.perf_counter() - t0:.0f}s", flush=True)
        except Exception as e:  # config may exceed VMEM
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        fns[label] = (f1, f2)
    for k, v in defaults.items():
        setattr(fused, k, v)

    best = {label: [np.inf, np.inf] for label in fns}
    for rep in range(REPS):
        if rep and rep % 5 == 0:
            print(f"rep {rep}/{REPS}", flush=True)
        for label, (f1, f2) in fns.items():
            p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12 * (rep + 1)), params)
            t0 = time.perf_counter()
            np.asarray(f1(p2, Hx, Hy, Px, Py))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f2(p2, Hx, Hy, Px, Py))
            t2 = time.perf_counter() - t0
            best[label][0] = min(best[label][0], t1)
            best[label][1] = min(best[label][1], t2)

    print(f"mode={mode}, N={N}, slope K={K1}->{K2}, min of {REPS}")
    for label, (t1, t2) in best.items():
        dt = (t2 - t1) / (K2 - K1)
        print(f"{label:24s} {dt*1e3:7.3f} ms/step -> "
              f"{N/dt/1e6:7.1f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
