"""TPU-native scaling: shard a million-ray trace over a device mesh.

The trace is elementwise in the ray axis, so GSPMD partitions it with
ZERO communication; a merit reduction adds one psum. On a real pod the
same code spans hosts (ICI + DCN); here it runs on whatever devices are
available (set XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu to try an 8-device virtual mesh on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.parallel import make_mesh, shard_rays
from optiland_tpu.trace.tracer import trace_system_final


def main(n_rays: int = 1 << 18):
    lens = CookeTriplet()
    static, params = lens.build()

    mesh = make_mesh()  # all visible devices on a 1-D ray axis
    n_dev = int(np.prod(mesh.devices.shape))
    n_rays -= n_rays % n_dev  # keep the shard sizes equal
    print(f"mesh: {n_dev} x {mesh.devices.flat[0].platform} device(s), "
          f"{n_rays:,} rays")

    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n_rays)).astype(np.float32)
    th = rng.uniform(0, 2 * np.pi, size=n_rays).astype(np.float32)
    zeros = np.zeros(n_rays, np.float32)
    data = shard_rays(mesh, (zeros, zeros, r * np.cos(th), r * np.sin(th),
                             np.full(n_rays, 0.55, np.float32)))

    @jax.jit
    def merit(params, Hx, Hy, Px, Py, w):
        out = trace_system_final(static, params, Hx, Hy, Px, Py, w)
        x, y, i = out["x"], out["y"], out["intensity"]
        s = jnp.sum(i) + 1e-12
        cx, cy = jnp.sum(x * i) / s, jnp.sum(y * i) / s
        return jnp.sum(((x - cx) ** 2 + (y - cy) ** 2) * i) / s

    val, grads = jax.value_and_grad(merit)(params, *data)
    print(f"merit = {float(val):.6e}")
    print(f"|d merit / d cv| = "
          f"{np.abs(np.asarray(grads.cv)).max():.3e} (psum'd over mesh)")
    # the output sharding proves the trace ran partitioned
    print("input sharding:", data[0].sharding)
    return float(val)


if __name__ == "__main__":
    main()
