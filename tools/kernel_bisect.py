"""Bisect fused-kernel fwd cost: asphere vs conic, surface count scaling."""

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build(n_mid, asph):
    from optiland_tpu import set_precision
    from optiland_tpu.system.optic import Optic

    set_precision("float32")
    lens = Optic("bisect")
    inf = math.inf
    lens.add_surface(index=0, radius=inf, thickness=inf)
    kw = dict(surface_type="even_asphere",
              coefficients=(1e-7, -2e-11, 3e-15)) if asph else {}
    idx = 1
    for j in range(n_mid):
        mat = 1.6 if j % 2 == 0 else None
        if mat:
            lens.add_surface(index=idx, radius=50.0 + j, thickness=3.0,
                             material=mat, **kw, is_stop=(j == n_mid // 2))
        else:
            lens.add_surface(index=idx, radius=-(60.0 + j), thickness=4.0,
                             **kw)
        idx += 1
    lens.add_surface(index=idx, radius=inf, thickness=40.0)
    lens.add_surface(index=idx + 1)
    lens.set_aperture(aperture_type="EPD", value=10)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.5876, is_primary=True)
    return lens


def measure(lens, N=2_000_000):
    import jax
    import jax.numpy as jnp

    from optiland_tpu.trace.fused import trace_system_final_fused

    static, params = lens.build()
    rng = np.random.default_rng(0)
    Px = jnp.asarray(rng.uniform(-0.7, 0.7, N).astype(np.float32))
    Py = jnp.asarray(rng.uniform(-0.7, 0.7, N).astype(np.float32))
    Hx = jnp.zeros_like(Px)
    Hy = jnp.zeros_like(Px)
    w = 0.5876

    import jax.tree_util as jtu

    ITERS = 20

    def scan_fn(p, a, b, c, d):
        def body(p, _):
            out = trace_system_final_fused(static, p, a, b, c, d, w)
            s = sum(jnp.sum(v) for v in out.values())
            p2 = jtu.tree_map(lambda x: x + 1e-30 * s.astype(x.dtype), p)
            return p2, s
        _, ss = jax.lax.scan(body, p, None, length=ITERS)
        return ss

    f = jax.jit(scan_fn)
    np.asarray(f(params, Hx, Hy, Px, Py))
    p2 = jtu.tree_map(lambda a: a * (1.0 + 1e-12), params)
    t0 = time.perf_counter()
    np.asarray(f(p2, Hx, Hy, Px, Py))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    res = {}
    for n_mid, asph, tag in [(10, False, "10conic"), (10, True, "10asph"),
                             (5, False, "5conic"), (20, False, "20conic"),
                             (2, False, "2conic")]:
        res[tag + "_ms"] = measure(build(n_mid, asph))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
