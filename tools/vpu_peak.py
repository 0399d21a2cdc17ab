"""Measure achievable VPU f32 FMA and transcendental throughput on this
chip — the roofline anchor for PERF.md (ray tracing is elementwise, so the
VPU, not the MXU, is its speed of light)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANE = 256, 128
N_TILES = 64
K_FMA = 512      # FMAs per element per pass
K_TRANS = 64     # transcendentals per element per pass


def fma_kernel(x_ref, o_ref):
    # acc = acc*x + c is a degree-K polynomial in x: not strength-reducible,
    # every step is one genuine vector FMA
    x = x_ref[:] * 0.51
    acc = x
    for _ in range(K_FMA):
        acc = acc * x + 0.003
    o_ref[:] = acc


def sqrt_kernel(x_ref, o_ref):
    x = x_ref[:]
    acc = x
    for _ in range(K_TRANS):
        acc = jax.lax.rsqrt(acc + 1.5)
    o_ref[:] = acc


def tan_kernel(x_ref, o_ref):
    x = x_ref[:]
    acc = x
    for _ in range(K_TRANS):
        acc = jnp.tan(acc * 0.001)
    o_ref[:] = acc


def run(kernel, n_ops_per_elem, flops_per_op):
    x = jnp.asarray(np.random.default_rng(0).uniform(
        1.0, 2.0, (N_TILES * ROWS, LANE)).astype(np.float32))
    spec = pl.BlockSpec((ROWS, LANE), lambda g: (g, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda x: pl.pallas_call(
        kernel, grid=(N_TILES,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x))
    out = jax.block_until_ready(f(x))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    n_elem = x.size
    return n_elem * n_ops_per_elem / dt, dt


def main():
    res = {}
    ops, dt = run(fma_kernel, K_FMA, 2)
    res["fma_per_s"] = ops
    res["fma_tflops_f32"] = ops * 2 / 1e12
    ops, dt = run(sqrt_kernel, K_TRANS, 1)
    res["rsqrt_per_s"] = ops
    ops, dt = run(tan_kernel, K_TRANS, 1)
    res["tan_per_s"] = ops
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
