"""Capture a `jax.profiler` device trace of the bench step (SURVEY §5 row 1).

Writes a TensorBoard-compatible trace to --out (default
/tmp/optiland_tpu_trace). On the tunneled "axon" platform device-side
profiling may be unsupported; the script degrades to a host-side trace and
says so. The honest wall-clock numbers come from bench.py / PERF.md — this
tool is for inspecting op-level structure (fusion boundaries, kernel
launches), not for headline timing.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/optiland_tpu_trace")
    ap.add_argument("--rays", type=int, default=500_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_bench_system
    from optiland_tpu.optimization.merits import centroid_rms_spot

    lens = build_bench_system()
    static, params = lens.build()
    N = args.rays
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=N)).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, size=N).astype(np.float32)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    Hy = jnp.asarray(rng.uniform(-1, 1, size=N).astype(np.float32))
    Hx = jnp.zeros_like(Hy)

    step = jax.jit(jax.value_and_grad(
        lambda p: centroid_rms_spot(static, p, Hx, Hy, Px, Py, 0.5876)))
    # compile outside the trace window
    loss, g = step(params)
    np.asarray(loss)

    try:
        with jax.profiler.trace(args.out):
            for _ in range(3):
                loss, g = step(params)
            np.asarray(loss)
        print(f"trace written to {args.out} (open with TensorBoard: "
              f"tensorboard --logdir {args.out})")
    except Exception as e:
        print(f"device trace unavailable on this platform "
              f"({type(e).__name__}: {e}); falling back to host profile")
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for _ in range(3):
            loss, g = step(params)
        np.asarray(loss)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(15)


if __name__ == "__main__":
    main()
