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


def stop_radius(static, params, wavelength):
    """Effective stop radius used as the aim target (reference
    `ray_aiming/initialization.py:24-189`): float-by-stop systems use the
    stop surface's set semi-aperture; otherwise iterative/robust aiming
    traces a REAL marginal ray (axis-parallel at y=EPD/2 for infinite
    objects, object-center to pupil-edge otherwise) and takes |y| at the
    stop, falling back to the paraxial marginal height when that ray dies.
    """
    from optiland_tpu.core.rays import make_rays
    from optiland_tpu.system import paraxial as px
    from optiland_tpu.system.spec import positions_of

    stop = static.stop_index
    if static.aperture_type == "float_by_stop":
        return params.ap_radius[stop]

    ym, _ = px.marginal_ray(static, params, wavelength)
    r_par = jnp.abs(ym.ravel()[stop])

    epd = px.EPD(static, params)
    epl = px.EPL(static, params)
    pos = positions_of(static, params)
    dtype = params.cv.dtype
    half = epd / 2.0
    if static.object_infinite:
        x0 = jnp.zeros((1,), dtype)
        y0 = jnp.full((1,), half, dtype)
        z0 = jnp.full((1,), pos[1] - 100.0, dtype)
        L0 = jnp.zeros((1,), dtype)
        M0 = jnp.zeros((1,), dtype)
        N0 = jnp.ones((1,), dtype)
    else:
        dy = half
        dz = epl - pos[0]
        mag = jnp.sqrt(dy * dy + dz * dz)
        x0 = jnp.zeros((1,), dtype)
        y0 = jnp.zeros((1,), dtype)
        z0 = jnp.full((1,), pos[0], dtype)
        L0 = jnp.zeros((1,), dtype)
        M0 = jnp.full((1,), dy / mag, dtype)
        N0 = jnp.full((1,), dz / mag, dtype)
    rays = make_rays(x0, y0, z0, L0, M0, N0, wavelength=wavelength,
                     dtype=dtype)
    hist = trace_rays(static, params, rays)
    r_real = jnp.abs(hist.y[stop][0])
    ok = (hist.intensity[stop][0] > 0) & jnp.isfinite(r_real) & (r_real > 0)
    return jnp.where(ok, r_real, r_par)


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
    r_stop = stop_radius(static, params, wavelength)

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
                    iters: int = 6, max_outer: int = 320, dt0: float = 0.125,
                    dt_min: float = 1.0 / 2048.0, tol: float = 1e-4):
    """Per-ray adaptive continuation (reference `ray_aiming/robust.py:22-171`):
    deform the trivial t=0 solution into the real one by walking the field
    AND pupil target from 0 to full scale. Unlike a fixed stage grid, each
    ray carries its own continuation parameter `t` and step `dt`: a Newton
    result is only ACCEPTED if the aimed ray is geometrically live (no
    missed-surface/TIR masking — the batched analogue of the reference's
    NaN-triggered ValueError) and hits the stop target; otherwise the step
    is halved, exactly like the reference's recursive interval subdivision
    — but fully batched and jittable (`lax.while_loop`)."""
    import dataclasses

    r_stop = stop_radius(static, params, wavelength)

    # probe trace with aperture clipping disabled: validity must reflect
    # geometry (missed surface / TIR) only — a legitimately vignetted ray
    # still aims fine in the reference (apertures never NaN there)
    S = static.num_surfaces
    static_noap = dataclasses.replace(
        static, has_aperture=(False,) * S, aperture_masks=(None,) * S)

    def newton(qx, qy, Hxt, Hyt, Pxt, Pyt):
        def body(carry, _):
            ax, ay = carry

            def fx(a, b):
                sx, sy = _stop_hit(static, params, Hxt, Hyt, a, b,
                                   wavelength)
                return sx / r_stop - Pxt, sy / r_stop - Pyt

            (ex, ey), (dex_dqx, dey_dqx) = jax.jvp(
                lambda a: fx(a, ay), (ax,), (jnp.ones_like(ax),))
            _, (dex_dqy, dey_dqy) = jax.jvp(
                lambda b: fx(ax, b), (ay,), (jnp.ones_like(ay),))
            det = dex_dqx * dey_dqy - dex_dqy * dey_dqx
            det = jnp.where(jnp.abs(det) > 1e-14, det, 1e-14)
            dqx = (ex * dey_dqy - ey * dex_dqy) / det
            dqy = (ey * dex_dqx - ex * dey_dqx) / det
            # trust region: clamp the Newton step to half a pupil radius so
            # near-singular Jacobians at grazing incidence cannot fling the
            # iterate out of the basin (the reference recovers from this by
            # subdividing, `robust.py:158-170`)
            step = jnp.sqrt(dqx * dqx + dqy * dqy)
            lim = jnp.where(step > 0.5, 0.5 / jnp.maximum(step, 1e-30), 1.0)
            return (ax - dqx * lim, ay - dqy * lim), None

        (qx, qy), _ = jax.lax.scan(body, (qx, qy), None, length=iters)
        return qx, qy

    def probe(qx, qy, Hxt, Hyt):
        rays0 = generate_rays(static_noap, params, Hxt, Hyt, qx, qy,
                              wavelength, apply_vignetting=False)
        hist = trace_rays(static_noap, params, rays0)
        k = static.stop_index
        return hist.x[k], hist.y[k], hist.intensity[-1] > 0

    zero = jnp.zeros_like(Px)

    def cond(state):
        k, t, dt, qx, qy = state
        return jnp.logical_and(k < max_outer, jnp.any(t < 1.0))

    def body(state):
        k, t, dt, qx, qy = state
        t_new = jnp.minimum(t + dt, 1.0)
        # differential predictor (reference `robust.py:131-141`): the target
        # scales linearly with t, so rescale the accepted solution
        scale = jnp.where(t > 0, t_new / jnp.maximum(t, 1e-12), 1.0)
        qn_x, qn_y = newton(qx * scale, qy * scale,
                            Hx * t_new, Hy * t_new,
                            Px * t_new, Py * t_new)
        sx, sy, live = probe(qn_x, qn_y, Hx * t_new, Hy * t_new)
        ex = sx / r_stop - Px * t_new
        ey = sy / r_stop - Py * t_new
        ok = (live & (ex * ex + ey * ey < tol * tol)
              & jnp.isfinite(qn_x) & jnp.isfinite(qn_y))
        adv = ok & (t < 1.0)
        qx = jnp.where(adv, qn_x, qx)
        qy = jnp.where(adv, qn_y, qy)
        t = jnp.where(adv, t_new, t)
        # gentle growth: x2 overshoots at extreme field and thrashes the
        # accept/reject cycle (measured on the 160/170-deg projection
        # lenses, whose edge rays only advance in ~0.01 t-steps near t=1)
        dt = jnp.where(ok, jnp.minimum(dt * 1.25, 0.125),
                       jnp.maximum(dt * 0.5, dt_min))
        return (k + 1, t, dt, qx, qy)

    state = (jnp.zeros((), jnp.int32), zero, jnp.full_like(Px, dt0),
             zero, zero)
    _, t, _, qx, qy = jax.lax.while_loop(cond, body, state)
    # final polish at the full target (quadratic convergence from the
    # accepted t=1 solution tightens tol -> machine precision) — guarded:
    # an unguarded Newton can blow an extreme-field iterate up to NaN, so
    # keep the polished coords only where they are finite, live, and at
    # least as close to the stop target as the continuation solution
    qpx, qpy = newton(qx, qy, Hx, Hy, Px, Py)

    def err2(ax, ay):
        sx, sy, live = probe(ax, ay, Hx, Hy)
        ex = sx / r_stop - Px
        ey = sy / r_stop - Py
        e2 = ex * ex + ey * ey
        return jnp.where(live & jnp.isfinite(e2), e2, jnp.inf)

    better = (jnp.isfinite(qpx) & jnp.isfinite(qpy)
              & (err2(qpx, qpy) <= err2(qx, qy)))
    return jnp.where(better, qpx, qx), jnp.where(better, qpy, qy)
