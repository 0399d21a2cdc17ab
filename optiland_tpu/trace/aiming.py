"""Ray aiming strategies.

The reference ships paraxial / iterative / robust / cached aimers
(`rays/ray_aiming/`, SURVEY.md §2.2). The paraxial aimer is the default
closed form inside `generate_rays`. The iterative aimer here re-casts the
reference's per-ray Newton loop (`ray_aiming/iterative.py:60-367`) as a
fixed-iteration, fully batched Newton over aim-point scale factors with the
2x2 per-ray Jacobian computed by forward-mode JVP probes — jittable,
differentiable, and shard-transparent (the "hard part" called out in
SURVEY.md §7). The robust aimer runs the same kernel with a damped
continuation schedule; caching is subsumed by jit (the aim solve lives
inside the compiled trace graph).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optiland_tpu.system.spec import SystemParams, SystemStatic
from optiland_tpu.trace.raygen import generate_rays
from optiland_tpu.trace.tracer import trace_rays


def _stop_hit(static, params, Hx, Hy, qx, qy, wavelength):
    """(x, y) at the stop surface for rays aimed at pupil coords (qx, qy)."""
    rays0 = generate_rays(static, params, Hx, Hy, qx, qy,
                          wavelength, apply_vignetting=False)
    hist = trace_rays(static, params, rays0)
    k = static.stop_index
    return hist.x[k], hist.y[k]


def aim_rays_iterative(static: SystemStatic, params: SystemParams, Hx, Hy,
                       Px, Py, wavelength, iters: int = 6,
                       damping: float = 1.0, q0=None):
    """Newton-correct the normalized pupil coords so each ray crosses the
    stop surface at exactly (Px, Py) * r_stop.

    Returns the corrected (Px', Py') to feed to `generate_rays`. `q0`
    optionally warm-starts the Newton iteration (used by the robust
    homotopy wrapper).
    """
    from optiland_tpu.system import paraxial as px

    ym, _ = px.marginal_ray(static, params, wavelength)
    r_stop = ym.ravel()[static.stop_index]

    def body(carry, _):
        qx, qy = carry

        def fx(a, b):
            sx, sy = _stop_hit(static, params, Hx, Hy, a, b, wavelength)
            return sx / r_stop - Px, sy / r_stop - Py

        (ex, ey), (dex_dqx, dey_dqx) = jax.jvp(
            lambda a: fx(a, qy), (qx,), (jnp.ones_like(qx),))
        _, (dex_dqy, dey_dqy) = jax.jvp(
            lambda b: fx(qx, b), (qy,), (jnp.ones_like(qy),))
        det = dex_dqx * dey_dqy - dex_dqy * dey_dqx
        det = jnp.where(jnp.abs(det) > 1e-14, det, 1e-14)
        dqx = (ex * dey_dqy - ey * dex_dqy) / det
        dqy = (ey * dex_dqx - ex * dey_dqx) / det
        return (qx - damping * dqx, qy - damping * dqy), None

    init = (Px, Py) if q0 is None else q0
    (qx, qy), _ = jax.lax.scan(body, init, None, length=iters)
    return qx, qy


def aim_rays_robust(static, params, Hx, Hy, Px, Py, wavelength,
                    stages: int = 3, iters: int = 3):
    """Homotopy wrapper (reference `ray_aiming/robust.py:22-171`): walk the
    field from 0 to its target in `stages` steps, warm-starting each Newton
    solve from the previous stage's solution — keeps strongly aberrated
    wide-angle systems convergent."""
    q = (Px, Py)
    for s in range(1, stages + 1):
        f = s / stages
        q = aim_rays_iterative(static, params, Hx * f, Hy * f,
                               Px, Py, wavelength, iters=iters, q0=q)
    return q
