"""Differentiable ray tracing hello world (reference Tutorial_1f): the
whole trace is a jitted JAX function of the lens parameters, so
`jax.grad` gives exact derivatives of any image-space metric with respect
to any surface parameter — here d(RMS spot)/d(curvature of surface 1),
verified against a finite difference."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.trace.tracer import trace_system_final


def main():
    lens = CookeTriplet()
    static, params = lens.build()

    # pupil samples for a small on-axis bundle
    n = 64
    key = jax.random.PRNGKey(0)
    px, py = jax.random.uniform(key, (2, n), minval=-1.0, maxval=1.0)
    zeros = jnp.zeros(n)

    def rms_spot(params):
        out = trace_system_final(static, params, zeros, zeros, px, py,
                                 jnp.full(n, 0.55))
        x, y, i = out["x"], out["y"], out["intensity"]
        w = i / jnp.sum(i)
        cx, cy = jnp.sum(w * x), jnp.sum(w * y)
        return jnp.sqrt(jnp.sum(w * ((x - cx) ** 2 + (y - cy) ** 2)))

    val, grads = jax.value_and_grad(rms_spot)(params)
    g = float(np.asarray(grads.cv[1]))
    print(f"rms spot = {float(val):.6e} mm")
    print(f"d(rms)/d(c1) = {g:+.6e}  (analytic, via jax.grad)")

    # finite-difference check
    eps = 1e-6
    p_hi = replace(params, cv=params.cv.at[1].add(eps))
    p_lo = replace(params, cv=params.cv.at[1].add(-eps))
    fd = (float(rms_spot(p_hi)) - float(rms_spot(p_lo))) / (2 * eps)
    print(f"d(rms)/d(c1) = {fd:+.6e}  (central finite difference)")
    assert np.isclose(g, fd, rtol=1e-3)
    return g


if __name__ == "__main__":
    main()
