"""Fused Pallas trace kernel: the whole surface chain in VMEM.

The XLA path materializes inter-surface ray state in HBM between fusion
boundaries, and reverse-mode AD stores its residuals there too. This kernel
runs the ENTIRE multi-surface trace for a tile of rays inside VMEM — forward
in one pass, and a custom-VJP backward that re-traces the tile and
differentiates in-register (`jax.vjp` inside the kernel body), writing only
the final state / small parameter cotangents to HBM. That is the
"one fused Pallas kernel per trace" design of SURVEY.md §7, covering the
bench-relevant system class:

  supported: plane / conic / even- & odd-asphere geometries, tilt/decenter
  (thickness-relative CS), refract / reflect / none interactions, radial
  apertures, dispersive or ideal media, Beer-Lambert absorption, simple
  (scalar R/T) coatings, per-ray wavelengths.
  Everything else (freeforms, gratings/phase, polarized coatings, BSDFs,
  abs-CS folds, aperture masks) falls back to the reference-parity XLA path
  (`trace/tracer.py`), which remains the semantic oracle in tests.

Two entry points:
  - `trace_final`   — final-surface state only (the optimization/bench hot
    path; in-kernel VJP backward, no (S, N) history in HBM).
  - `trace_history_fused` — full (S, N) history via per-surface VMEM->HBM
    writes (forward fused; backward delegates to the XLA trace, which is
    mathematically identical).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.geometry.surfaces import (
    GEOM_BICONIC,
    GEOM_CHEBYSHEV,
    GEOM_CONIC,
    GEOM_EVEN_ASPHERE,
    GEOM_FORBES_Q2D,
    GEOM_FORBES_QBFS,
    GEOM_ODD_ASPHERE,
    GEOM_PLANE,
    GEOM_POLYNOMIAL_XY,
    GEOM_TOROIDAL,
    GEOM_ZERNIKE,
    sag_and_grad,
)
from optiland_tpu.materials.dispersion import material_index
from optiland_tpu.system.spec import (
    COAT_NONE,
    COAT_SIMPLE,
    INT_DIFFRACT,
    INT_NONE,
    INT_PHASE,
    INT_REFLECT,
    INT_THIN_LENS,
    PHASE_CONSTANT,
    PHASE_LINEAR_GRATING,
    PHASE_NONE,
    PHASE_RADIAL,
    SystemParams,
    SystemStatic,
)

# inline fast path (hand-tuned sag/grad); everything else in
# _SUPPORTED_GEOMS goes through the shared `sag_and_grad` library with a
# conic-seeded Newton (same structure as the XLA `intersect`)
_INLINE_GEOMS = (GEOM_PLANE, GEOM_CONIC, GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE)
_SUPPORTED_GEOMS = _INLINE_GEOMS + (
    GEOM_POLYNOMIAL_XY, GEOM_BICONIC, GEOM_TOROIDAL, GEOM_CHEBYSHEV,
    GEOM_ZERNIKE, GEOM_FORBES_QBFS, GEOM_FORBES_Q2D)
_SUPPORTED_INTERACTIONS = (0, INT_REFLECT, INT_NONE, INT_THIN_LENS,
                           INT_DIFFRACT, INT_PHASE)
_ANALYTIC_PHASE = (PHASE_NONE, PHASE_CONSTANT, PHASE_RADIAL,
                   PHASE_LINEAR_GRATING)
_EPS = 1e-12

# ray-tile geometry: LANE lanes x TR sublane rows per grid step
_LANE = 128
_TR_FWD = 128
_TR_BWD = 64   # the in-kernel VJP roughly doubles live VMEM
_SUB = 32  # register-blocking row chunk (one f32 vreg of sublanes)
_SUB_BWD = 32  # backward's chunk (the adjoint live set differs from fwd)

# Newton refinement cap for the fused kernel: the conic closed form seeds
# within ~1e-3 of the asphere root, and Newton is quadratic, so 2 iterations
# plus the implicit-function-theorem correction step land far below f32 eps
# (the kernel's only hardware dtype; measured in tests/test_fused_kernel.py
# kernel-vs-XLA parity at every geometry branch). NOTE: this deliberately
# overrides `static.newton_iters` inside the kernel — the f32 tile cannot
# benefit from more steps once below f32 eps. The XLA oracle path keeps
# `static.newton_iters` (default 16) for f64 reference parity.
_NEWTON_FUSED_MAX = 2
# freeform seeds (conic guess on a biconic/toroidal/Zernike carrier) start
# further from the root than asphere seeds; give them a few more steps
_NEWTON_FUSED_MAX_FF = 6


def on_tpu() -> bool:
    """Whether the default JAX backend is a TPU (incl. the tunneled 'axon'
    platform). Pallas interpret mode on CPU is orders of magnitude slower
    than plain XLA, so the fused kernel auto-selects only on hardware."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _mosaic_ok(rays0) -> bool:
    """Hardware lowering needs f32 tiles (Mosaic has no f64 vector path)."""
    return rays0.x.dtype == jnp.float32


def supports_fused(static: SystemStatic) -> bool:
    """Whether the fused kernel covers this system class. Includes the
    build-time measured Newton-cap guard (`spec._fused_newton_seed_ok`):
    a steep asphere whose conic seed does not converge under the kernel's
    `_NEWTON_FUSED_MAX` cap falls back to the XLA path."""
    return (
        static.fused_newton_ok
        and not static.has_abs_cs
        and all(g in _SUPPORTED_GEOMS for g in static.geom_codes)
        and all(i in _SUPPORTED_INTERACTIONS for i in static.interactions)
        and all(pk in _ANALYTIC_PHASE for pk in static.phase_kinds)
        and all(c in (COAT_NONE, COAT_SIMPLE) for c in static.coatings)
        and all(b is None for b in static.bsdfs)
        and static.apodization is None
        and all(m is None for m in static.aperture_masks)
    )


def supports_fused_raygen(static: SystemStatic) -> bool:
    """Whether ray generation itself can run inside the kernel: the per-ray
    part of `trace/raygen.py` reduces to elementwise math given a handful of
    differentiable scalars (EPL/EPD/field scale/start plane) for these field
    types. Telecentric aiming, vignetting factors and the image-height field
    solves keep the XLA raygen. object_height with an infinite object is
    excluded so the XLA path's clear ValueError fires instead of the kernel
    silently tracing from -inf (ADVICE r3)."""
    return (
        static.field_type in ("angle", "object_height")
        and not (static.field_type == "object_height"
                 and static.object_infinite)
        and not static.telecentric
        and not static.has_vignetting
        and static.apodization is None
    )


def _raygen_scalars(static: SystemStatic, params: SystemParams):
    """Differentiable scalar prologue for the in-kernel raygen: everything
    in `generate_rays` that does not depend on the per-ray coordinates.
    Returns a (5,) vector [epl, epd, fmax, a, b] whose meaning depends on
    the (static) field type — see `_tile_raygen`."""
    from optiland_tpu.system import paraxial as px
    from optiland_tpu.system.spec import positions_of

    epl = px.EPL(static, params)
    epd = px.EPD(static, params)
    pos = positions_of(static, params)
    fmax = jnp.sqrt(jnp.max(params.x_fields ** 2 + params.y_fields ** 2))
    if static.field_type == "angle" and static.object_infinite:
        offset = epd - jnp.min(pos[1:-1])
        a = pos[1] - offset   # start plane z
        b = offset + epl      # lever arm for the field-angle offset
    else:
        a = pos[0]            # object plane z
        b = epl - pos[0]
    return jnp.stack([epl, epd, fmax, a, b]).astype(params.cv.dtype)


def _tile_raygen(static: SystemStatic, rg, Hx, Hy, Px, Py):
    """Per-tile ray generation — semantics identical to
    `raygen.generate_rays` for the `supports_fused_raygen` class (parity
    tested). Returns (x0, y0, z0, L, M, N, i, opd)."""
    epl, epd, fmax, a, b = rg[0], rg[1], rg[2], rg[3], rg[4]
    half = epd * 0.5
    if static.field_type == "angle":
        tx = jnp.tan(jnp.deg2rad(fmax * Hx))
        ty = jnp.tan(jnp.deg2rad(fmax * Hy))
        if static.object_infinite:
            x0 = Px * half - tx * b
            y0 = Py * half - ty * b
            z0 = jnp.broadcast_to(a, Px.shape)
        else:
            x0 = jnp.broadcast_to(-tx * b, Px.shape)
            y0 = jnp.broadcast_to(-ty * b, Px.shape)
            z0 = jnp.broadcast_to(a, Px.shape)
    else:  # object_height (finite object)
        x0 = jnp.broadcast_to(fmax * Hx, Px.shape)
        y0 = jnp.broadcast_to(fmax * Hy, Px.shape)
        z0 = jnp.broadcast_to(a, Px.shape)
    # aim at the paraxial entrance pupil
    dx = Px * half - x0
    dy = Py * half - y0
    dz = epl - z0
    mag2 = dx * dx + dy * dy + dz * dz
    degen = (mag2 < 1e-18).astype(dx.dtype)
    inv = jax.lax.rsqrt(jnp.maximum(mag2, 1e-18))
    L = (1.0 - degen) * dx * inv
    M = (1.0 - degen) * dy * inv
    N = (1.0 - degen) * dz * inv + degen
    i = jnp.ones_like(Px)
    opd = jnp.zeros_like(Px)
    return x0, y0, z0, L, M, N, i, opd


def _kv_interp(w, kwl, kval):
    """Unrolled linear interpolation of the (K,)-point extinction table —
    jnp.interp semantics (edge-clamped), float masks only (Mosaic has no
    vector bool select on all paths)."""
    K = kwl.shape[0]
    lo = (w <= kwl[0]).astype(w.dtype)
    hi = (w > kwl[K - 1]).astype(w.dtype)
    kv = lo * kval[0] + hi * kval[K - 1]
    for j in range(K - 1):
        w0 = kwl[j]
        w1 = kwl[j + 1]
        dw = jnp.where(jnp.abs(w1 - w0) > _EPS, w1 - w0,
                       jnp.asarray(1.0, w.dtype))
        frac = (w - w0) / dw
        val = kval[j] + frac * (kval[j + 1] - kval[j])
        inseg = ((w > w0).astype(w.dtype) * (w <= w1).astype(w.dtype))
        kv = kv + inseg * val
    return kv


def _sag_grad_terms(code, n_coeffs, coeffs_k, cvk, kk, r2, want_sag):
    """Conic+polynomial sag (optional) and its radial gradient factors.

    Returns (sag, gx_factor_x, gy_factor_y) where the gradient is
    (x * fx, y * fy) for even aspheres and includes the 1/r odd terms.
    """
    m = jnp.maximum(1.0 - kk * cvk * cvk * r2, _EPS)
    inv_root = jax.lax.rsqrt(m)
    root = m * inv_root
    s_val = cvk * r2 / (1.0 + root) if want_sag else None
    gmul = cvk * inv_root
    if code == GEOM_EVEN_ASPHERE and n_coeffs:
        rp = r2
        rp0 = jnp.ones_like(r2)
        g = jnp.zeros_like(r2)
        for ci in range(n_coeffs):
            if want_sag:
                s_val = s_val + coeffs_k[ci] * rp
                rp = rp * r2
            g = g + 2.0 * (ci + 1) * coeffs_k[ci] * rp0
            rp0 = rp0 * r2
        return s_val, gmul + g, gmul + g, None
    if code == GEOM_ODD_ASPHERE and n_coeffs:
        r = jnp.sqrt(jnp.maximum(r2, _EPS))
        rpow = r
        rpow0 = jnp.ones_like(r)
        g = jnp.zeros_like(r)
        for ci in range(n_coeffs):
            if want_sag:
                s_val = s_val + coeffs_k[ci] * rpow
                rpow = rpow * r
            g = g + (ci + 1) * coeffs_k[ci] * rpow0
            rpow0 = rpow0 * r
        # gradient = x*gmul + (x/r)*g
        return s_val, gmul, gmul, g / r
    return s_val, gmul, gmul, None


def _refract_fwd_impl(L, M, N, nx, ny, nz, u):
    """Vector Snell refraction with TIR passthrough. `n` must be oriented
    along the incident ray (n.l >= 0). Returns (L', M', N', okf)."""
    c = L * nx + M * ny + N * nz
    d2 = 1.0 - u * u * (1.0 - c * c)
    okf = (d2 >= 0.0).astype(L.dtype)
    rt = jnp.sqrt(jnp.maximum(d2, 0.0))
    q = rt - u * c
    Lo = okf * (u * L + q * nx) + (1.0 - okf) * L
    Mo = okf * (u * M + q * ny) + (1.0 - okf) * M
    No = okf * (u * N + q * nz) + (1.0 - okf) * N
    return (Lo, Mo, No, okf), (L, M, N, nx, ny, nz, u, c, rt, q, okf)


@jax.custom_vjp
def _refract_cv(L, M, N, nx, ny, nz, u):
    """Refract with a hand-derived adjoint: JAX's generated transpose of
    the branchy Snell chain costs ~2x the closed-form cotangent (the
    in-kernel VJP is the headline bottleneck; see PERF.md)."""
    out, _ = _refract_fwd_impl(L, M, N, nx, ny, nz, u)
    return out


def _refract_cv_fwd(L, M, N, nx, ny, nz, u):
    return _refract_fwd_impl(L, M, N, nx, ny, nz, u)


def _refract_cv_bwd(res, g):
    L, M, N, nx, ny, nz, u, c, rt, q, okf = res
    gL, gM, gN, _gok = g  # okf is a mask: no cotangent
    gpL = okf * gL
    gpM = okf * gM
    gpN = okf * gN
    thru = 1.0 - okf
    du = L * gpL + M * gpM + N * gpN          # from u*l term
    dq = nx * gpL + ny * gpM + nz * gpN
    # q = rt - u c ; rt = sqrt(max(d2,0)) ; d2 = 1 - u^2 (1 - c^2)
    dd2 = okf * (0.5 * dq) / jnp.maximum(rt, _EPS)
    du = du - c * dq - 2.0 * u * (1.0 - c * c) * dd2
    dc = -u * dq + 2.0 * (u * u) * c * dd2
    # c = l . n
    dL = u * gpL + thru * gL + dc * nx
    dM = u * gpM + thru * gM + dc * ny
    dN = u * gpN + thru * gN + dc * nz
    dnx = q * gpL + dc * L
    dny = q * gpM + dc * M
    dnz = q * gpN + dc * N
    if jnp.ndim(u) == 0:
        du = jnp.sum(du)
    return dL, dM, dN, dnx, dny, dnz, du


_refract_cv.defvjp(_refract_cv_fwd, _refract_cv_bwd)


@jax.custom_vjp
def _reflect_cv(L, M, N, nx, ny, nz):
    """Mirror reflection l' = l - 2 (l.n) n with the closed-form adjoint
    (the Householder map is symmetric: dl = g - 2 (g.n) n)."""
    c = L * nx + M * ny + N * nz
    return L - 2.0 * c * nx, M - 2.0 * c * ny, N - 2.0 * c * nz


def _reflect_cv_fwd(L, M, N, nx, ny, nz):
    c = L * nx + M * ny + N * nz
    out = (L - 2.0 * c * nx, M - 2.0 * c * ny, N - 2.0 * c * nz)
    return out, (L, M, N, nx, ny, nz, c)


def _reflect_cv_bwd(res, g):
    L, M, N, nx, ny, nz, c = res
    gL, gM, gN = g
    gn = gL * nx + gM * ny + gN * nz
    dL = gL - 2.0 * gn * nx
    dM = gM - 2.0 * gn * ny
    dN = gN - 2.0 * gn * nz
    dnx = -2.0 * (gn * L + c * gL)
    dny = -2.0 * (gn * M + c * gM)
    dnz = -2.0 * (gn * N + c * gN)
    return dL, dM, dN, dnx, dny, dnz


_reflect_cv.defvjp(_reflect_cv_fwd, _reflect_cv_bwd)


def _tile_trace(static: SystemStatic, uniform_w, diffp, nondiffp,
                x, y, z, L, M, N, i, opd, w, record=False, for_grad=True):
    """Pure per-tile trace for the supported subset — semantics identical to
    `trace/tracer.py` (validated by parity tests).

    diffp: (cv, conic, coeffs, thickness, tilt, decenter, mat_coeffs,
            coating_params, n_table) — differentiated by the in-kernel VJP.
    nondiffp: (ap_radius, k_wl, k_val, alpha_table) — closed over.
    uniform_w: the trace is monochromatic — per-surface indices n(λ) and
    absorption coefficients were hoisted out of the kernel into the (S,)
    `n_table` / `alpha_table` (differentiable through `mat_coeffs` in the
    enclosing graph), so no per-ray dispersion math runs in-tile.
    """
    (cv, conic, coeffs, thickness, tilt, decenter, mat_coeffs,
     coating_params, n_table, grating, phase_params, focal_length) = diffp
    ap_radius, k_wl, k_val, alpha_table = nondiffp
    S = static.num_surfaces
    pos_prev = jnp.zeros((), cv.dtype)
    one = jnp.asarray(1.0, cv.dtype)
    eps = jnp.asarray(_EPS, cv.dtype)

    def n_of(k):
        if uniform_w:
            return n_table[k]
        return material_index(static.mat_formulas[k], static.mat_n_coeffs[k],
                              mat_coeffs[k], w)

    records = [(x, y, z, L, M, N, i, opd)] if record else None
    n_pre = n_of(0)
    for k in range(1, S):
        # vertex position from the thickness chain (differentiable)
        pos_k = pos_prev + (thickness[k - 1] if k > 1 else 0.0)
        pos_prev = pos_k

        tilted = static.has_tilt[k]
        decentered = static.has_decenter[k]
        tx = decenter[k, 0]
        ty = decenter[k, 1]
        # localize (reference `coordinate_system.py:73-89`)
        if tilted or decentered:
            x = x - tx
            y = y - ty
        z = z - pos_k
        if tilted:
            rx, ry, rz = tilt[k, 0], tilt[k, 1], tilt[k, 2]
            for c_, s_, rot in (
                (jnp.cos(-rz), jnp.sin(-rz), "z"),
                (jnp.cos(-ry), jnp.sin(-ry), "y"),
                (jnp.cos(-rx), jnp.sin(-rx), "x"),
            ):
                if rot == "z":
                    x, y = x * c_ - y * s_, x * s_ + y * c_
                    L, M = L * c_ - M * s_, L * s_ + M * c_
                elif rot == "y":
                    x, z = x * c_ + z * s_, -x * s_ + z * c_
                    L, N = L * c_ + N * s_, -L * s_ + N * c_
                else:
                    y, z = y * c_ - z * s_, y * s_ + z * c_
                    M, N = M * c_ - N * s_, M * s_ + N * c_

        code = static.geom_codes[k]
        cvk = cv[k]
        kk = 1.0 + conic[k]
        # closed-form conic intersection (curvature form)
        A = cvk * (L * L + M * M + kk * N * N)
        B = 2.0 * (cvk * (L * x + M * y + kk * N * z) - N)
        C = cvk * (x * x + y * y + kk * z * z) - 2.0 * z
        disc = B * B - 4.0 * A * C
        # float mask instead of bool vectors (Mosaic-friendly)
        validf = (disc >= 0.0).astype(A.dtype)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        # NOTE: scalar `where` branches must be dtype-matched — a weak f64
        # literal under jax_enable_x64 lowers to tpu.truncf, which Mosaic
        # cannot legalize
        A_safe = jnp.where(jnp.abs(A) > _EPS, A, one)
        inv2A = 1.0 / (2.0 * A_safe)
        t1 = (-B + sq) * inv2A
        t2 = (-B - sq) * inv2A
        z1 = z + t1 * N
        z2 = z + t2 * N
        t_quad = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)
        B_safe = jnp.where(jnp.abs(B) > _EPS, B, eps)
        t = jnp.where(jnp.abs(A) > _EPS, t_quad, -C / B_safe)
        validf = jnp.where(jnp.abs(A) > _EPS, validf, one)

        n_coeffs = static.geom_n_coeffs[k]
        aux_k = static.geom_aux[k]
        freeform = code not in _INLINE_GEOMS
        if freeform:
            # conic-seeded fixed-count Newton through the shared sag/grad
            # library (`geometry/surfaces.py:sag_and_grad`) — the same
            # structure as the XLA `intersect`, with the detached-iterate +
            # single-IFT-step trick below so the in-kernel VJP never stores
            # the iteration chain
            t = jax.lax.stop_gradient(t)
            n_newton = min(static.newton_iters, _NEWTON_FUSED_MAX_FF)
            for _it in range(n_newton + 1):
                if _it == n_newton:
                    t = jax.lax.stop_gradient(t)
                xt = x + t * L
                yt = y + t * M
                zt = z + t * N
                s_val, gx, gy = sag_and_grad(code, n_coeffs, xt, yt, cvk,
                                             conic[k], coeffs[k], aux_k)
                f = s_val - zt
                fp = gx * L + gy * M - N
                fp = jnp.where(jnp.abs(fp) > _EPS, fp, eps)
                t = t - f / fp
        elif code in (GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE) and n_coeffs:
            # Fixed-count Newton refinement with analytic sag gradient.
            # Iterations run on a detached root, then ONE differentiable
            # step closes the graph: t* = t - F/F' with F(t)≈0 gives
            # dt/dp = -F_p/F_t — the implicit-function-theorem derivative
            # (same trick as `surfaces.intersect_implicit`), so the
            # in-kernel VJP never stores the 16-iteration chain.
            t = jax.lax.stop_gradient(t)
            n_newton = min(static.newton_iters, _NEWTON_FUSED_MAX)
            for _it in range(n_newton + 1):
                if _it == n_newton:
                    t = jax.lax.stop_gradient(t)
                xt = x + t * L
                yt = y + t * M
                zt = z + t * N
                r2 = xt * xt + yt * yt
                s_val, fx, fy, godd = _sag_grad_terms(
                    code, n_coeffs, coeffs[k], cvk, kk, r2, True)
                if godd is None:
                    gx = xt * fx
                    gy = yt * fy
                else:
                    gx = xt * fx + xt * godd
                    gy = yt * fy + yt * godd
                f = s_val - zt
                fp = gx * L + gy * M - N
                fp = jnp.where(jnp.abs(fp) > _EPS, fp, eps)
                t = t - f / fp
        elif code != GEOM_PLANE and for_grad:
            # pure conic (or coeff-less asphere): the closed-form root is
            # exact, but letting AD transpose the branchy quadratic formula
            # (both roots, sqrt, selects, safe-divides) costs ~2x the ops of
            # the IFT adjoint. Detach the root and close the graph with one
            # implicit-function-theorem step — F(t*)=0 so the value is
            # unchanged (shift ~F/F' is below dtype eps) and
            # dt/dθ = -F_θ/F_t, the same trick as the Newton paths above
            # (measured ~8% off the fwd+bwd step). The pure value pass
            # (`for_grad=False`: the un-differentiated fwd kernels) skips
            # this step — it only changes the *gradient* graph.
            t = jax.lax.stop_gradient(t)
            xt = x + t * L
            yt = y + t * M
            zt = z + t * N
            r2c = xt * xt + yt * yt
            s_val, fx, fy, _ = _sag_grad_terms(code, 0, coeffs[k], cvk, kk,
                                               r2c, True)
            f = s_val - zt
            fp = (xt * fx) * L + (yt * fy) * M - N
            fp = jnp.where(jnp.abs(fp) > _EPS, fp, eps)
            t = t - f / fp

        x = x + t * L
        y = y + t * M
        z = z + t * N
        opd = opd + jnp.abs(t * n_pre)
        i = i * validf
        if static.has_absorption[k - 1]:
            # Beer-Lambert through the medium before this surface
            # (reference `propagation/homogeneous.py:44-53`)
            if uniform_w:
                alpha = alpha_table[k - 1]
            else:
                kv = _kv_interp(w, k_wl[k - 1], k_val[k - 1])
                alpha = 4.0 * jnp.pi * kv / w
            i = i * jnp.exp(-alpha * t * 1e3)
        if static.has_aperture[k]:
            i = i * (x * x + y * y <= ap_radius[k] ** 2).astype(i.dtype)

        interaction = static.interactions[k]
        if interaction != INT_NONE:
            # surface normal (aligned into the incident direction)
            if freeform:
                _, gx, gy = sag_and_grad(code, n_coeffs, x, y, cvk,
                                         conic[k], coeffs[k], aux_k)
            else:
                r2 = x * x + y * y
                _, fx, fy, godd = _sag_grad_terms(
                    code, n_coeffs, coeffs[k], cvk, kk, r2, False)
                if godd is None:
                    gx = x * fx
                    gy = y * fy
                else:
                    gx = x * fx + x * godd
                    gy = y * fy + y * godd
            inv_mag = jax.lax.rsqrt(gx * gx + gy * gy + 1.0)
            nx, ny, nz = gx * inv_mag, gy * inv_mag, -inv_mag

            if interaction in (INT_THIN_LENS, INT_DIFFRACT, INT_PHASE):
                n_post = n_of(k)
                if interaction == INT_THIN_LENS:
                    # ideal thin lens (tracer `_thin_lens_interact`), incl.
                    # the quadratic phase transformation of the OPD
                    # (reference `thin_lens_interaction_model.py:71`)
                    ux = L / N
                    uy = M / N
                    ux2 = (n_pre * ux - x / focal_length[k]) / n_post
                    uy2 = (n_pre * uy - y / focal_length[k]) / n_post
                    N = jax.lax.rsqrt(1.0 + ux2 * ux2 + uy2 * uy2)
                    L = ux2 * N
                    M = uy2 * N
                    opd = opd - (x * x + y * y) / (2.0 * focal_length[k])
                elif interaction == INT_DIFFRACT:
                    L, M, N, i = _tile_diffract(
                        static, k, grating, L, M, N, i, w,
                        nx, ny, nz, gx, gy, n_pre, n_post)
                else:
                    L, M, N, i, opd = _tile_phase(
                        static, k, phase_params, x, y, L, M, N, i, opd, w,
                        nx, ny, nz, n_pre, n_post,
                        static.is_reflective[k])
                n_pre = n_post
            else:
                dot = L * nx + M * ny + N * nz
                sgn = jnp.sign(dot)
                nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

                if interaction == INT_REFLECT:
                    # note: |dot| folds into the oriented normal —
                    # l - 2 cosi n == l - 2 (l.n) n with n oriented
                    L, M, N = _reflect_cv(L, M, N, nx, ny, nz)
                    n_post = n_pre
                else:
                    n_post = n_of(k)
                    u = n_pre / n_post
                    L, M, N, okf = _refract_cv(L, M, N, nx, ny, nz, u)
                    i = i * okf
                n_pre = n_post

            if static.coatings[k] == COAT_SIMPLE:
                # fixed-R/T coating: intensity scale only (reference
                # `coatings.py` SimpleCoating; T on refract, R on reflect)
                scale = (coating_params[k, 1]
                         if interaction == INT_REFLECT
                         else coating_params[k, 0])
                i = i * scale

        # globalize
        if tilted:
            for c_, s_, rot in (
                (jnp.cos(rx), jnp.sin(rx), "x"),
                (jnp.cos(ry), jnp.sin(ry), "y"),
                (jnp.cos(rz), jnp.sin(rz), "z"),
            ):
                if rot == "z":
                    x, y = x * c_ - y * s_, x * s_ + y * c_
                    L, M = L * c_ - M * s_, L * s_ + M * c_
                elif rot == "y":
                    x, z = x * c_ + z * s_, -x * s_ + z * c_
                    L, N = L * c_ + N * s_, -L * s_ + N * c_
                else:
                    y, z = y * c_ - z * s_, y * s_ + z * c_
                    M, N = M * c_ - N * s_, M * s_ + N * c_
        z = z + pos_k
        if tilted or decentered:
            x = x + tx
            y = y + ty

        if record:
            records.append((x, y, z, L, M, N, i, opd))

    if record:
        return records
    return x, y, z, L, M, N, i, opd




def _tile_diffract(static, k, grating, L, M, N, i, w,
                   nx, ny, nz, gx, gy, n1, n2):
    """In-kernel grating diffraction — mirrors `tracer._grating_interact`
    + `core.rays.grating_diffract` (reference `diffractive_model.py:28-61`,
    `real_rays.py:207-522`). (nx, ny, nz) is the raw nz<0 carrier normal,
    (gx, gy) its sag gradient."""
    m = grating[k, 0]
    d = grating[k, 1]
    angle = grating[k, 2]
    code = static.geom_codes[k]
    reflective = static.is_reflective[k]
    one = jnp.ones_like(L)

    if code == GEOM_PLANE:
        nxx = jnp.zeros_like(L)
        nyy = jnp.zeros_like(L)
        nzz = one
        fx = -jnp.sin(angle) * one
        fy = jnp.cos(angle) * one
        fz = jnp.zeros_like(L)
    else:
        nxx, nyy, nzz = nx, ny, nz
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        tz_ = gx * ca + gy * sa
        ux, uy, uz = -nxx, -nyy, -nzz
        fx = uy * tz_ - uz * sa
        fy = uz * ca - ux * tz_
        fz = ux * sa - uy * ca
        inv = jax.lax.rsqrt(fx * fx + fy * fy + fz * fz)
        fx, fy, fz = -fx * inv, -fy * inv, -fz * inv

    pp = d * jax.lax.rsqrt(fx * fx + fy * fy)

    # align the normal into the incident direction (rays._align_normal)
    dot = L * nxx + M * nyy + N * nzz
    sgn = jnp.sign(dot)
    nxx, nyy, nzz = nxx * sgn, nyy * sgn, nzz * sgn
    cosi = jnp.abs(dot)

    utx = L - cosi * nxx
    uty = M - cosi * nyy
    utz = N - cosi * nzz
    fdotn = fx * nxx + fy * nyy + fz * nzz
    ftx = fx - fdotn * nxx
    fty = fy - fdotn * nyy
    ftz = fz - fdotn * nzz

    n2c = -n2 if reflective else n2
    Tx = n1 * pp * utx + m * w * ftx
    Ty = n1 * pp * uty + m * w * fty
    Tz = n1 * pp * utz + m * w * ftz
    Q = pp * pp * n2 * n2 - (Tx * Tx + Ty * Ty + Tz * Tz)
    okf = (Q >= 0.0).astype(L.dtype)
    root = jnp.sqrt(jnp.maximum(Q, 0.0))
    inv_den = 1.0 / (pp * n2c)
    s = -1.0 if reflective else 1.0
    Lr = (Tx - nxx * root) * inv_den
    Mr = (Ty - nyy * root) * inv_den
    Nr = (Tz + s * nzz * root) * inv_den
    inv_mag = jax.lax.rsqrt(Lr * Lr + Mr * Mr + Nr * Nr)
    L = okf * Lr * inv_mag + (1.0 - okf) * L
    M = okf * Mr * inv_mag + (1.0 - okf) * M
    N = okf * Nr * inv_mag + (1.0 - okf) * N
    return L, M, N, i * okf


def _phase_vg_inline(kind, p, x, y):
    """Analytic phase value + gradient for the in-kernel phase branch
    (constant / radial / linear grating; grid/height kinds are excluded by
    `supports_fused`)."""
    if kind == PHASE_CONSTANT:
        z = jnp.zeros_like(x)
        return p[0] + z, z, z
    if kind == PHASE_RADIAL:
        r2 = x * x + y * y
        phase = jnp.zeros_like(x)
        dphi_dr2 = jnp.zeros_like(x)
        rp = r2
        rp_prev = jnp.ones_like(x)
        for ci in range(p.shape[0]):
            phase = phase + p[ci] * rp
            dphi_dr2 = dphi_dr2 + p[ci] * (ci + 1) * rp_prev
            rp_prev = rp
            rp = rp * r2
        return phase, 2.0 * x * dphi_dr2, 2.0 * y * dphi_dr2
    # PHASE_LINEAR_GRATING
    return p[0] * x + p[1] * y, p[0] + 0.0 * x, p[1] + 0.0 * y


def _tile_phase(static, k, phase_params, x, y, L, M, N, i, opd, w,
                nx, ny, nz, n1, n2, reflective):
    """In-kernel generalized-Snell phase sheet — mirrors
    `tracer._phase_interact` (reference
    `interactions/phase_interaction_model.py:45-131`)."""
    if reflective:
        n2 = n1
    k0 = 2.0 * jnp.pi / (w * 1e-3)
    phase, gpx, gpy = _phase_vg_inline(static.phase_kinds[k],
                                       phase_params[k], x, y)
    g_dot_n = gpx * nx + gpy * ny
    Gx = gpx - g_dot_n * nx
    Gy = gpy - g_dot_n * ny
    Gz = -g_dot_n * nz
    kix = n1 * k0 * L
    kiy = n1 * k0 * M
    kiz = n1 * k0 * N
    ki_dot_n = kix * nx + kiy * ny + kiz * nz
    kpx = kix - ki_dot_n * nx + Gx
    kpy = kiy - ki_dot_n * ny + Gy
    kpz = kiz - ki_dot_n * nz + Gz
    R_sq = (n2 * k0) ** 2 - (kpx * kpx + kpy * kpy + kpz * kpz)
    okf = (R_sq >= 0.0).astype(L.dtype)
    alpha = jnp.sqrt(jnp.maximum(R_sq, 0.0))
    sgn = (-1.0 if reflective else 1.0) * jnp.sign(ki_dot_n)
    alpha = sgn * alpha
    kox = kpx + alpha * nx
    koy = kpy + alpha * ny
    koz = kpz + alpha * nz
    inv_mag = jax.lax.rsqrt(kox * kox + koy * koy + koz * koz)
    L = okf * kox * inv_mag + (1.0 - okf) * L
    M = okf * koy * inv_mag + (1.0 - okf) * M
    N = okf * koz * inv_mag + (1.0 - okf) * N
    return L, M, N, i * okf, opd - phase / k0


def _diff_params(params: SystemParams, n_table=None):
    if n_table is None:
        n_table = jnp.zeros_like(params.cv)
    return (params.cv, params.conic, params.coeffs, params.thickness,
            params.tilt, params.decenter, params.mat_coeffs,
            params.coating_params, n_table, params.grating,
            params.phase_params, params.focal_length)


def _nondiff_params(params: SystemParams, alpha_table=None):
    if alpha_table is None:
        alpha_table = jnp.zeros_like(params.cv)
    return (params.ap_radius, params.k_wl, params.k_val, alpha_table)


def _uniform_tables(static: SystemStatic, params: SystemParams, w):
    """Hoist monochromatic per-surface dispersion out of the kernel.

    Returns (n_table, alpha_table): refractive index after each surface
    (differentiable through `mat_coeffs`) and the Beer-Lambert coefficient
    4π·k(λ)/λ per gap (extinction tables are non-differentiable, matching
    the XLA path)."""
    w = jnp.asarray(w, params.cv.dtype)
    n_table = jnp.stack([
        material_index(static.mat_formulas[k], static.mat_n_coeffs[k],
                       params.mat_coeffs[k], w)
        for k in range(static.num_surfaces)
    ])
    if any(static.has_absorption):
        kv = jax.vmap(lambda kw, kval: jnp.interp(w, kw, kval))(
            params.k_wl, params.k_val)
        alpha_table = 4.0 * jnp.pi * kv / w
    else:
        alpha_table = jnp.zeros_like(params.cv)
    return n_table, alpha_table


def _vmem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM


def _full_spec(shape):
    """Whole-array VMEM BlockSpec with an explicit int32 index map.

    Under jax_enable_x64, Pallas's DEFAULT index map returns Python-int
    zeros that trace as i64 — Mosaic cannot legalize the resulting
    `func.return (i64)`. Explicit jnp.int32 literals avoid it.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndim = len(shape)
    return pl.BlockSpec(shape,
                        lambda g: tuple(jnp.int32(0) for _ in range(ndim)),
                        memory_space=pltpu.VMEM)


def _pad_2d(a, rows, cols, fill=0.0):
    n = a.shape[0]
    pad = rows * cols - n
    return jnp.pad(a, (0, pad), constant_values=fill).reshape(rows, cols)


def _grid_shapes(n, tr):
    rows = -(-n // _LANE)
    rows_pad = -(-rows // tr) * tr
    return rows_pad, rows_pad // tr


def _pad_rays(rays_flat, rows_pad):
    # pad fills: N with 1 (unit direction) and w with 1 (keeps dispersion
    # formulas finite in dead lanes; their cotangent seeds are zero)
    return [_pad_2d(a, rows_pad, _LANE, fill=(1.0 if idx in (5, 8) else 0.0))
            for idx, a in enumerate(rays_flat)]


# ---------------------------------------------------------------------------
# final-state kernel (custom VJP, in-kernel backward)
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_trace_final(static: SystemStatic, interpret: bool, uniform_w: bool,
                      params, rays_flat):
    """Final-surface ray state via the fused kernel.

    Args:
        params: (diffp_tuple, nondiffp_tuple) — see `_tile_trace`.
        rays_flat: (x, y, z, L, M, N, i, opd, w) arrays of shape (n,).
    Returns the 8 final arrays (x, y, z, L, M, N, i, opd).
    """
    return _fused_forward(static, interpret, uniform_w, params, rays_flat)


def _fused_forward(static, interpret, uniform_w, params, rays_flat):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    diffp, nondiffp = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)
    x = rays_flat[0]
    n = x.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_FWD)

    def kernel(*refs):
        rays_r = refs[:9]
        diff_r = refs[9:9 + n_diff]
        nondiff_r = refs[9 + n_diff:9 + n_diff + n_nondiff]
        outs = refs[9 + n_diff + n_nondiff:]
        res = _tile_trace(static, uniform_w,
                          tuple(r[:] for r in diff_r),
                          tuple(r[:] for r in nondiff_r),
                          *(r[:] for r in rays_r), for_grad=False)
        for o, v in zip(outs, res):
            o[:] = v

    ins = _pad_rays(rays_flat, rows_pad)
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]

    ray_spec = pl.BlockSpec((_TR_FWD, _LANE), lambda g: (g, jnp.int32(0)),
                            memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * 9
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp])
    out_shape = [jax.ShapeDtypeStruct((rows_pad, _LANE), x.dtype)
                 for _ in range(8)]
    out_specs = [ray_spec] * 8

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return tuple(o.reshape(-1)[:n] for o in outs)


def _fused_fwd(static, interpret, uniform_w, params, rays_flat):
    out = _fused_forward(static, interpret, uniform_w, params, rays_flat)
    return out, (params, rays_flat)


def _fused_bwd(static, interpret, uniform_w, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params, rays_flat = res
    diffp, nondiffp = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)

    # in-kernel VJP: re-trace the tile and differentiate in VMEM
    def kernel(*refs):
        rays_r = refs[:9]
        diff_r = refs[9:9 + n_diff]
        nondiff_r = refs[9 + n_diff:9 + n_diff + n_nondiff]
        seed_r = refs[9 + n_diff + n_nondiff:9 + n_diff + n_nondiff + 8]
        outs = refs[9 + n_diff + n_nondiff + 8:]
        w_tile = rays_r[8][:]
        nondiff_vals = tuple(r[:] for r in nondiff_r)

        def f(*args):
            dp = args[:n_diff]
            rays8 = args[n_diff:]
            return _tile_trace(static, uniform_w, dp, nondiff_vals, *rays8,
                               w_tile)

        _, vjp = jax.vjp(f, *(r[:] for r in diff_r),
                         *(r[:] for r in rays_r[:8]))
        grads = vjp(tuple(s[:] for s in seed_r))
        d_diff = grads[:n_diff]
        d_rays = grads[n_diff:]

        gidx = pl.program_id(0)
        # parameter cotangents accumulate across the sequential ray-tile grid
        small = outs[8:]
        for o, v in zip(small, d_diff):
            @pl.when(gidx == 0)
            def _(o=o, v=v):
                o[:] = v

            @pl.when(gidx > 0)
            def _(o=o, v=v):
                o[:] = o[:] + v

        for o, v in zip(outs[:8], d_rays):
            o[:] = v

    x = rays_flat[0]
    n = x.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_BWD)

    ins = _pad_rays(rays_flat, rows_pad)
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]
    gsafe = [jnp.zeros_like(x) if gg is None else gg for gg in g]
    ins += [_pad_2d(a, rows_pad, _LANE) for a in gsafe]

    ray_spec = pl.BlockSpec((_TR_BWD, _LANE), lambda gq: (gq, jnp.int32(0)),
                            memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * 9
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp]
                + [ray_spec] * 8)
    out_shape = ([jax.ShapeDtypeStruct((rows_pad, _LANE), x.dtype)
                  for _ in range(8)]
                 + [jax.ShapeDtypeStruct(np.shape(p), x.dtype)
                    for p in diffp])
    out_specs = ([ray_spec] * 8
                 + [_full_spec(np.shape(p)) for p in diffp])

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)

    d_rays = tuple(o.reshape(-1)[:n] for o in outs[:8])
    d_diff = tuple(outs[8:])
    d_nondiff = tuple(jnp.zeros_like(jnp.asarray(p)) for p in nondiffp)
    d_w = jnp.zeros_like(rays_flat[8])
    return (d_diff, d_nondiff), d_rays + (d_w,)


fused_trace_final.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# raygen+trace kernel: ray generation fused into the same VMEM tile
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_raygen_trace_final(static: SystemStatic, interpret: bool,
                             uniform_w: bool, out_keys: tuple, params, data):
    """Final-surface state straight from normalized (field, pupil)
    coordinates: raygen runs inside the kernel tile, so the 9 per-ray
    starting-state arrays never touch HBM (VERDICT r2 item 1a).

    Args:
        out_keys: static tuple of indices into (x, y, z, L, M, N, i, opd)
            selecting which final arrays to produce. Requesting only what
            the merit consumes lets Mosaic DCE the unused adjoint chains in
            the backward kernel (the cotangent seeds for them never exist).
        params: (diffp, nondiffp, rg) — `_tile_trace` params + the (5,)
            raygen scalar vector (differentiable).
        data: (Hx, Hy, Px, Py, w) arrays of shape (n,).
    """
    return _raygen_forward(static, interpret, uniform_w, out_keys, params,
                           data)


def _raygen_forward(static, interpret, uniform_w, out_keys, params, data):
    from jax.experimental import pallas as pl

    diffp, nondiffp, rg = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)
    Hx = data[0]
    n = Hx.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_FWD)

    def kernel(*refs):
        data_r = refs[:5]
        rg_r = refs[5]
        diff_r = refs[6:6 + n_diff]
        nondiff_r = refs[6 + n_diff:6 + n_diff + n_nondiff]
        outs = refs[6 + n_diff + n_nondiff:]
        rg_v = rg_r[:]
        diff_vals = tuple(r[:] for r in diff_r)
        nondiff_vals = tuple(r[:] for r in nondiff_r)
        # register blocking: run the whole surface chain on one (8, LANE)
        # vreg-sized row chunk at a time — the chain keeps ~20 ray-state
        # arrays live, and at full tile width those are 16+ vregs each,
        # far past the physical register file, so Mosaic spills every op
        # to VMEM (measured 10x below VPU peak). One-vreg chunks keep the
        # dataflow in registers.
        for j in range(_TR_FWD // _SUB):
            sl = slice(j * _SUB, (j + 1) * _SUB)
            rays8 = _tile_raygen(static, rg_v,
                                 *(r[sl, :] for r in data_r[:4]))
            res = _tile_trace(static, uniform_w, diff_vals, nondiff_vals,
                              *rays8, data_r[4][sl, :], for_grad=False)
            for o, ki in zip(outs, out_keys):
                o[sl, :] = res[ki]

    # pad fill: w lanes get 1 to keep dispersion finite in dead lanes
    ins = [_pad_2d(a, rows_pad, _LANE, fill=(1.0 if idx == 4 else 0.0))
           for idx, a in enumerate(data)]
    ins += [jnp.asarray(rg)]
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]

    ray_spec = pl.BlockSpec((_TR_FWD, _LANE), lambda g: (g, jnp.int32(0)),
                            memory_space=_vmem())
    in_specs = ([ray_spec] * 5 + [_full_spec(np.shape(rg))]
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp])
    out_shape = [jax.ShapeDtypeStruct((rows_pad, _LANE), Hx.dtype)
                 for _ in out_keys]
    out_specs = [ray_spec] * len(out_keys)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return tuple(o.reshape(-1)[:n] for o in outs)


def _raygen_fwd(static, interpret, uniform_w, out_keys, params, data):
    out = _raygen_forward(static, interpret, uniform_w, out_keys, params,
                          data)
    return out, (params, data)


def _raygen_bwd(static, interpret, uniform_w, out_keys, res, g):
    from jax.experimental import pallas as pl

    params, data = res
    diffp, nondiffp, rg = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)

    def kernel(*refs):
        data_r = refs[:5]
        rg_r = refs[5]
        diff_r = refs[6:6 + n_diff]
        nondiff_r = refs[6 + n_diff:6 + n_diff + n_nondiff]
        n_out = len(out_keys)
        seed_r = refs[6 + n_diff + n_nondiff:6 + n_diff + n_nondiff + n_out]
        outs = refs[6 + n_diff + n_nondiff + n_out:]
        acc_outs = outs[:1 + n_diff]      # rg + diff params: accumulated
        data_outs = outs[1 + n_diff:]     # Hx/Hy/Px/Py/w: per-ray tiles
        nondiff_vals = tuple(r[:] for r in nondiff_r)
        rg_v = rg_r[:]
        diff_vals = tuple(r[:] for r in diff_r)

        # register-blocked VJP (same rationale as the fwd kernel): one
        # (SUB, LANE) row chunk per jax.vjp keeps the re-trace + adjoint
        # live set at a few vregs per value
        acc = None
        for j in range(max(_TR_BWD // _SUB_BWD, 1)):
            sl = slice(j * _SUB_BWD, (j + 1) * _SUB_BWD)
            data_vals = tuple(r[sl, :] for r in data_r[:4])
            w_tile = data_r[4][sl, :]

            # Hx/Hy/Px/Py/w are differentiated too: the chain adjoint is
            # already propagated to the raygen boundary for d_rg, so their
            # cotangents only add the elementwise raygen adjoint
            # (ADVICE r3: data cotangents must not be silently zero).
            def f(rg_v, Hx_t, Hy_t, Px_t, Py_t, w_tile, *dp):
                rays8 = _tile_raygen(static, rg_v, Hx_t, Hy_t, Px_t, Py_t)
                res = _tile_trace(static, uniform_w, dp, nondiff_vals,
                                  *rays8, w_tile)
                return tuple(res[ki] for ki in out_keys)

            _, vjp = jax.vjp(f, rg_v, *data_vals, w_tile, *diff_vals)
            grads = vjp(tuple(s[sl, :] for s in seed_r))
            d_data_tile = grads[1:6]
            for o, v in zip(data_outs, d_data_tile):
                o[sl, :] = v
            grads = grads[:1] + grads[6:]
            if acc is None:
                acc = list(grads)
            else:
                acc = [a + g_ for a, g_ in zip(acc, grads)]

        gidx = pl.program_id(0)
        # parameter cotangents accumulate across the sequential ray-tile grid
        for o, v in zip(acc_outs, acc):
            @pl.when(gidx == 0)
            def _(o=o, v=v):
                o[:] = v

            @pl.when(gidx > 0)
            def _(o=o, v=v):
                o[:] = o[:] + v

    Hx = data[0]
    n = Hx.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_BWD)

    ins = [_pad_2d(a, rows_pad, _LANE, fill=(1.0 if idx == 4 else 0.0))
           for idx, a in enumerate(data)]
    ins += [jnp.asarray(rg)]
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]
    gsafe = [jnp.zeros_like(Hx) if gg is None else gg for gg in g]
    ins += [_pad_2d(a, rows_pad, _LANE) for a in gsafe]

    ray_spec = pl.BlockSpec((_TR_BWD, _LANE), lambda gq: (gq, jnp.int32(0)),
                            memory_space=_vmem())
    in_specs = ([ray_spec] * 5 + [_full_spec(np.shape(rg))]
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp]
                + [ray_spec] * len(out_keys))
    out_shape = ([jax.ShapeDtypeStruct(np.shape(rg), Hx.dtype)]
                 + [jax.ShapeDtypeStruct(np.shape(p), Hx.dtype)
                    for p in diffp]
                 + [jax.ShapeDtypeStruct((rows_pad, _LANE), Hx.dtype)
                    for _ in range(5)])
    out_specs = ([_full_spec(np.shape(rg))]
                 + [_full_spec(np.shape(p)) for p in diffp]
                 + [ray_spec] * 5)

    from jax.experimental.pallas import tpu as pltpu

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    d_rg = outs[0]
    d_diff = tuple(outs[1:1 + len(diffp)])
    d_nondiff = tuple(jnp.zeros_like(jnp.asarray(p)) for p in nondiffp)
    d_data = tuple(o.reshape(-1)[:n] for o in outs[1 + len(diffp):])
    return (d_diff, d_nondiff, d_rg), d_data


fused_raygen_trace_final.defvjp(_raygen_fwd, _raygen_bwd)


def trace_system_final_fused(static: SystemStatic, params: SystemParams,
                             Hx, Hy, Px, Py, wavelength,
                             interpret: bool = False, outputs=None):
    """Raygen+trace in ONE kernel launch (the bench/optimization hot path).
    Caller must have checked `supports_fused(static)` and
    `supports_fused_raygen(static)`.

    `outputs`: optional iterable of output names from
    ("x", "y", "z", "L", "M", "N", "intensity", "opd") — requesting only
    what the merit consumes lets the backward kernel skip the unused
    adjoint chains entirely. Default: all eight."""
    dtype = params.cv.dtype
    Hx = jnp.broadcast_to(jnp.asarray(Hx, dtype), jnp.shape(Px))
    Hy = jnp.broadcast_to(jnp.asarray(Hy, dtype), jnp.shape(Px))
    Px = jnp.asarray(Px, dtype)
    Py = jnp.asarray(Py, dtype)
    uniform_w = jnp.ndim(wavelength) == 0
    w = jnp.broadcast_to(jnp.asarray(wavelength, dtype), jnp.shape(Px))
    if uniform_w:
        n_table, alpha_table = _uniform_tables(static, params, wavelength)
    else:
        n_table = alpha_table = None
    rg = _raygen_scalars(static, params)
    p = (_diff_params(params, n_table), _nondiff_params(params, alpha_table),
         rg)
    names = ("x", "y", "z", "L", "M", "N", "intensity", "opd")
    if outputs is None:
        out_keys = tuple(range(8))
    else:
        out_keys = tuple(sorted(names.index(o) for o in outputs))
    vals = fused_raygen_trace_final(
        static, interpret, uniform_w, out_keys, p, (Hx, Hy, Px, Py, w))
    return {names[ki]: v for ki, v in zip(out_keys, vals)}


def trace_final(static: SystemStatic, params: SystemParams, rays0,
                interpret: bool = False, wavelength=None):
    """Final-surface ray state: fused Pallas kernel when supported, XLA
    fallback otherwise. Returns a dict with x/y/z/L/M/N/intensity/opd.

    `wavelength`: pass the ORIGINAL wavelength argument of the trace call;
    when it is a scalar the per-surface dispersion is hoisted out of the
    kernel (monochromatic fast path)."""
    if (supports_fused(static) and getattr(rays0, "p", None) is None
            and (interpret or _mosaic_ok(rays0))):
        uniform_w = wavelength is not None and jnp.ndim(wavelength) == 0
        if uniform_w:
            n_table, alpha_table = _uniform_tables(static, params, wavelength)
        else:
            n_table = alpha_table = None
        p = (_diff_params(params, n_table),
             _nondiff_params(params, alpha_table))
        r = (rays0.x, rays0.y, rays0.z, rays0.L, rays0.M, rays0.N, rays0.i,
             rays0.opd, rays0.w)
        x, y, z, L, M, N, i, opd = fused_trace_final(
            static, interpret, uniform_w, p, r)
        return dict(x=x, y=y, z=z, L=L, M=M, N=N, intensity=i, opd=opd)
    from optiland_tpu.trace.tracer import trace_rays

    h = trace_rays(static, params, rays0)
    return dict(x=h.x[-1], y=h.y[-1], z=h.z[-1], L=h.L[-1], M=h.M[-1],
                N=h.N[-1], intensity=h.intensity[-1], opd=h.opd[-1])


# ---------------------------------------------------------------------------
# full-history kernel (forward fused; backward = XLA re-trace VJP)
# ---------------------------------------------------------------------------
def _history_forward(static, interpret, params, rays_flat):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    diffp, nondiffp = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)
    S = static.num_surfaces
    x = rays_flat[0]
    n = x.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_FWD)

    def kernel(*refs):
        rays_r = refs[:9]
        diff_r = refs[9:9 + n_diff]
        nondiff_r = refs[9 + n_diff:9 + n_diff + n_nondiff]
        outs = refs[9 + n_diff + n_nondiff:]  # 8 refs of (S, TR, LANE)
        records = _tile_trace(static, False,
                              tuple(r[:] for r in diff_r),
                              tuple(r[:] for r in nondiff_r),
                              *(r[:] for r in rays_r), record=True,
                              for_grad=False)
        for k, rec in enumerate(records):
            for o, v in zip(outs, rec):
                o[k, :, :] = v

    ins = _pad_rays(rays_flat, rows_pad)
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]

    ray_spec = pl.BlockSpec((_TR_FWD, _LANE), lambda g: (g, jnp.int32(0)),
                            memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec(
        (S, _TR_FWD, _LANE),
        lambda g: (jnp.int32(0), g, jnp.int32(0)),
        memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * 9
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp])
    out_shape = [jax.ShapeDtypeStruct((S, rows_pad, _LANE), x.dtype)
                 for _ in range(8)]
    out_specs = [hist_spec] * 8

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return tuple(o.reshape(S, -1)[:, :n] for o in outs)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_history(static, interpret, params, rays_flat):
    return _history_forward(static, interpret, params, rays_flat)


def _hist_xla(static, params, rays_flat):
    """The XLA trace on the same (diffp, nondiffp) parameterization —
    the mathematical twin of the fused forward, used for its backward."""
    from optiland_tpu.core.rays import Rays
    from optiland_tpu.trace.tracer import trace_rays

    diffp, nondiffp = params
    (cv, conic, coeffs, thickness, tilt, decenter, mat_coeffs,
     coating_params, _n_table, grating, phase_params, focal_length) = diffp
    ap_radius, k_wl, k_val, _alpha_table = nondiffp
    # rebuild a SystemParams with the traced leaves; remaining leaves are
    # placeholders never touched by the supported system class
    p = SystemParams(
        cv=cv, conic=conic, coeffs=coeffs, thickness=thickness, tilt=tilt,
        decenter=decenter, focal_length=focal_length,
        mat_coeffs=mat_coeffs, k_wl=k_wl, k_val=k_val, ap_radius=ap_radius,
        grating=grating,
        coating_params=coating_params,
        phase_params=phase_params,
        cs_pos=jnp.zeros((cv.shape[0], 3), cv.dtype),
        aperture_value=jnp.zeros((), cv.dtype),
        x_fields=jnp.zeros((1,), cv.dtype), y_fields=jnp.zeros((1,), cv.dtype),
        vx=jnp.zeros((1,), cv.dtype), vy=jnp.zeros((1,), cv.dtype),
        wavelengths=jnp.zeros((1,), cv.dtype),
    )
    rays0 = Rays(x=rays_flat[0], y=rays_flat[1], z=rays_flat[2],
                 L=rays_flat[3], M=rays_flat[4], N=rays_flat[5],
                 i=rays_flat[6], opd=rays_flat[7], w=rays_flat[8])
    h = trace_rays(static, p, rays0)
    return (h.x, h.y, h.z, h.L, h.M, h.N, h.intensity, h.opd)


def _fused_history_fwd(static, interpret, params, rays_flat):
    out = _history_forward(static, interpret, params, rays_flat)
    return out, (params, rays_flat)


def _fused_history_bwd(static, interpret, res, g):
    params, rays_flat = res
    _, vjp = jax.vjp(lambda p, r: _hist_xla(static, p, r), params, rays_flat)
    gsafe = tuple(
        jnp.zeros((static.num_surfaces, rays_flat[0].shape[0]),
                  rays_flat[0].dtype) if gg is None else gg for gg in g)
    d_params, d_rays = vjp(gsafe)
    return d_params, d_rays


_fused_history.defvjp(_fused_history_fwd, _fused_history_bwd)


def trace_history_fused(static: SystemStatic, params: SystemParams, rays0,
                        interpret: bool = False):
    """Full (S, N) TraceHistory via the fused kernel (XLA fallback when the
    system class is unsupported). Gradients flow via the XLA twin."""
    from optiland_tpu.trace.tracer import TraceHistory, trace_rays

    if (supports_fused(static) and getattr(rays0, "p", None) is None
            and (interpret or _mosaic_ok(rays0))):
        p = (_diff_params(params), _nondiff_params(params))
        r = (rays0.x, rays0.y, rays0.z, rays0.L, rays0.M, rays0.N, rays0.i,
             rays0.opd, rays0.w)
        x, y, z, L, M, N, i, opd = _fused_history(static, interpret, p, r)
        return TraceHistory(x=x, y=y, z=z, L=L, M=M, N=N, intensity=i,
                            opd=opd, p=None)
    return trace_rays(static, params, rays0)


# ---------------------------------------------------------------------------
# fused spot moments: raygen + trace + in-kernel weighted-moment reduction
# ---------------------------------------------------------------------------
# The optimization hot path's merit functions (centroid-RMS spot et al.)
# consume only four weighted moments of the final surface state:
#   m0 = sum(i), m1 = sum(x i), m2 = sum(y i), m3 = sum((x^2+y^2) i).
# Accumulating them inside the trace kernel removes every per-ray HBM
# output from the forward (24 MB -> 16 KB at 2M rays), the XLA merit
# reduction passes, and the per-ray cotangent seed arrays from the
# backward: the vjp of the moments is a 4-vector (c0..c3), and the
# backward kernel differentiates the per-chunk scalar
#   obj = c0*m0 + c1*m1 + c2*m2 + c3*m3
# directly — no seeds ever materialize.


def _row_mask(static_n, gidx, tr, j, dtype, sub=None):
    """Float validity mask for the (sub, LANE) chunk at grid step `gidx`,
    chunk `j`: 1.0 where the flattened ray index < n (padded rays must not
    contribute to the moment sums). `sub` is the caller's row-chunk size
    (forward `_SUB` / backward `_SUB_BWD`) — passed explicitly so the
    backward chunking can be tuned independently of the forward's."""
    if sub is None:
        sub = _SUB
    row0 = gidx * tr + j * sub
    rows = jax.lax.broadcasted_iota(jnp.int32, (sub, _LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (sub, _LANE), 1)
    idx = (row0 + rows) * _LANE + lanes
    return (idx < static_n).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_spot_moments(static: SystemStatic, interpret: bool, uniform_w: bool,
                       diff_data: bool, params, data):
    """(m0, m1, m2, m3) weighted spot moments at the image surface,
    computed by one kernel launch with in-kernel raygen + reduction.

    Caller contract: `supports_fused(static) and
    supports_fused_raygen(static)`. params/data as in
    `fused_raygen_trace_final`. `diff_data=False` declares the per-ray
    (Hx, Hy, Px, Py, w) cotangents unwanted — the backward kernel then
    skips their adjoint computation and HBM writes and returns zeros for
    them (an EXPLICIT opt-out, never silent: params-only optimization
    loops are the use case)."""
    m = _moments_forward(static, interpret, uniform_w, params, data)
    return tuple(jnp.sum(b) for b in m)


def _moments_forward(static, interpret, uniform_w, params, data):
    from jax.experimental import pallas as pl

    diffp, nondiffp, rg = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)
    Hx = data[0]
    n = Hx.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_FWD)

    def kernel(*refs):
        data_r = refs[:5]
        rg_r = refs[5]
        diff_r = refs[6:6 + n_diff]
        nondiff_r = refs[6 + n_diff:6 + n_diff + n_nondiff]
        outs = refs[6 + n_diff + n_nondiff:]   # 4 (8, LANE) moment buffers
        rg_v = rg_r[:]
        diff_vals = tuple(r[:] for r in diff_r)
        nondiff_vals = tuple(r[:] for r in nondiff_r)
        gidx = pl.program_id(0)
        dtype = data_r[0].dtype
        acc = [jnp.zeros((8, _LANE), dtype) for _ in range(4)]
        for j in range(_TR_FWD // _SUB):
            sl = slice(j * _SUB, (j + 1) * _SUB)
            rays8 = _tile_raygen(static, rg_v,
                                 *(r[sl, :] for r in data_r[:4]))
            res = _tile_trace(static, uniform_w, diff_vals, nondiff_vals,
                              *rays8, data_r[4][sl, :], for_grad=False)
            x, y, i = res[0], res[1], res[6]
            i = i * _row_mask(n, gidx, _TR_FWD, j, dtype)

            def red(v):
                return jnp.sum(v.reshape(_SUB // 8, 8, _LANE), axis=0)

            acc[0] = acc[0] + red(i)
            acc[1] = acc[1] + red(x * i)
            acc[2] = acc[2] + red(y * i)
            acc[3] = acc[3] + red((x * x + y * y) * i)
        for o, v in zip(outs, acc):
            @pl.when(gidx == 0)
            def _(o=o, v=v):
                o[:] = v

            @pl.when(gidx > 0)
            def _(o=o, v=v):
                o[:] = o[:] + v

    ins = [_pad_2d(a, rows_pad, _LANE, fill=(1.0 if idx == 4 else 0.0))
           for idx, a in enumerate(data)]
    ins += [jnp.asarray(rg)]
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]

    ray_spec = pl.BlockSpec((_TR_FWD, _LANE), lambda g: (g, jnp.int32(0)),
                            memory_space=_vmem())
    in_specs = ([ray_spec] * 5 + [_full_spec(np.shape(rg))]
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp])
    out_shape = [jax.ShapeDtypeStruct((8, _LANE), Hx.dtype)
                 for _ in range(4)]
    out_specs = [_full_spec((8, _LANE))] * 4

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return outs


def _moments_fwd(static, interpret, uniform_w, diff_data, params, data):
    m = _moments_forward(static, interpret, uniform_w, params, data)
    return tuple(jnp.sum(b) for b in m), (params, data)


def _moments_bwd(static, interpret, uniform_w, diff_data, res, g):
    from jax.experimental import pallas as pl

    params, data = res
    diffp, nondiffp, rg = params
    n_diff = len(diffp)
    n_nondiff = len(nondiffp)
    Hx = data[0]
    n = Hx.shape[0]
    rows_pad, grid = _grid_shapes(n, _TR_BWD)
    # the moment cotangents are 4 scalars — the whole seed of the backward
    c = jnp.stack([jnp.asarray(gg, Hx.dtype) if gg is not None
                   else jnp.zeros((), Hx.dtype) for gg in g])

    def kernel(*refs):
        data_r = refs[:5]
        rg_r = refs[5]
        c_r = refs[6]
        diff_r = refs[7:7 + n_diff]
        nondiff_r = refs[7 + n_diff:7 + n_diff + n_nondiff]
        outs = refs[7 + n_diff + n_nondiff:]
        acc_outs = outs[:1 + n_diff]
        data_outs = outs[1 + n_diff:]
        nondiff_vals = tuple(r[:] for r in nondiff_r)
        rg_v = rg_r[:]
        cv_ = c_r[:]
        diff_vals = tuple(r[:] for r in diff_r)
        gidx = pl.program_id(0)
        dtype = data_r[0].dtype

        acc = None
        for j in range(max(_TR_BWD // _SUB_BWD, 1)):
            sl = slice(j * _SUB_BWD, (j + 1) * _SUB_BWD)
            mask = _row_mask(n, gidx, _TR_BWD, j, dtype, sub=_SUB_BWD)

            def f(rg_v, Hx_t, Hy_t, Px_t, Py_t, w_tile, *dp):
                rays8 = _tile_raygen(static, rg_v, Hx_t, Hy_t, Px_t, Py_t)
                res = _tile_trace(static, uniform_w, dp, nondiff_vals,
                                  *rays8, w_tile)
                x, y, i = res[0], res[1], res[6]
                im = i * mask
                return jnp.sum(im * (cv_[0] + cv_[1] * x + cv_[2] * y
                                     + cv_[3] * (x * x + y * y)))

            if diff_data:
                argnums = tuple(range(6 + n_diff))
            else:
                # params-only: drop the Hx/Hy/Px/Py/w adjoints entirely
                argnums = (0,) + tuple(range(6, 6 + n_diff))
            grads = jax.grad(f, argnums=argnums)(
                rg_v, *(r[sl, :] for r in data_r[:4]), data_r[4][sl, :],
                *diff_vals)
            if diff_data:
                d_data_tile = grads[1:6]
                for o, v in zip(data_outs, d_data_tile):
                    o[sl, :] = v
                grads = grads[:1] + grads[6:]
            if acc is None:
                acc = list(grads)
            else:
                acc = [a + g_ for a, g_ in zip(acc, grads)]

        for o, v in zip(acc_outs, acc):
            @pl.when(gidx == 0)
            def _(o=o, v=v):
                o[:] = v

            @pl.when(gidx > 0)
            def _(o=o, v=v):
                o[:] = o[:] + v

    ins = [_pad_2d(a, rows_pad, _LANE, fill=(1.0 if idx == 4 else 0.0))
           for idx, a in enumerate(data)]
    ins += [jnp.asarray(rg), c]
    ins += [jnp.asarray(p) for p in diffp]
    ins += [jnp.asarray(p) for p in nondiffp]

    n_data_out = 5 if diff_data else 0
    ray_spec = pl.BlockSpec((_TR_BWD, _LANE), lambda gq: (gq, jnp.int32(0)),
                            memory_space=_vmem())
    in_specs = ([ray_spec] * 5 + [_full_spec(np.shape(rg)),
                                  _full_spec((4,))]
                + [_full_spec(np.shape(p)) for p in diffp]
                + [_full_spec(np.shape(p)) for p in nondiffp])
    out_shape = ([jax.ShapeDtypeStruct(np.shape(rg), Hx.dtype)]
                 + [jax.ShapeDtypeStruct(np.shape(p), Hx.dtype)
                    for p in diffp]
                 + [jax.ShapeDtypeStruct((rows_pad, _LANE), Hx.dtype)
                    for _ in range(n_data_out)])
    out_specs = ([_full_spec(np.shape(rg))]
                 + [_full_spec(np.shape(p)) for p in diffp]
                 + [ray_spec] * n_data_out)

    from jax.experimental.pallas import tpu as pltpu

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)

    d_rg = outs[0]
    d_diff = tuple(outs[1:1 + len(diffp)])
    d_nondiff = tuple(jnp.zeros_like(jnp.asarray(p)) for p in nondiffp)
    if diff_data:
        d_data = tuple(o.reshape(-1)[:n] for o in outs[1 + len(diffp):])
    else:
        d_data = tuple(jnp.zeros_like(jnp.asarray(a)) for a in data)
    return (d_diff, d_nondiff, d_rg), d_data


fused_spot_moments.defvjp(_moments_fwd, _moments_bwd)


def spot_moments(static: SystemStatic, params: SystemParams,
                 Hx, Hy, Px, Py, wavelength, interpret: bool = False,
                 diff_data: bool = True):
    """Weighted spot moments (m0, m1, m2, m3) = (sum i, sum x i, sum y i,
    sum (x^2+y^2) i) at the image surface, differentiable w.r.t. params and
    the field/pupil/wavelength inputs. Fused single-launch kernel when the
    system class supports it; XLA pipeline otherwise. This is the
    optimization hot path for spot-size style merits (see
    `optiland_tpu.optimization.merits`)."""
    dtype = params.cv.dtype
    Hxb = jnp.broadcast_to(jnp.asarray(Hx, dtype), jnp.shape(Px))
    Hyb = jnp.broadcast_to(jnp.asarray(Hy, dtype), jnp.shape(Px))
    Px = jnp.asarray(Px, dtype)
    Py = jnp.asarray(Py, dtype)
    uniform_w = jnp.ndim(wavelength) == 0
    wb = jnp.broadcast_to(jnp.asarray(wavelength, dtype), jnp.shape(Px))
    use_fused = (supports_fused(static) and supports_fused_raygen(static)
                 and (interpret or (on_tpu() and dtype == jnp.float32)))
    if use_fused:
        if uniform_w:
            n_table, alpha_table = _uniform_tables(static, params, wavelength)
        else:
            n_table = alpha_table = None
        rg = _raygen_scalars(static, params)
        p = (_diff_params(params, n_table),
             _nondiff_params(params, alpha_table), rg)
        return fused_spot_moments(static, interpret, uniform_w, diff_data,
                                  p, (Hxb, Hyb, Px, Py, wb))
    from optiland_tpu.trace.raygen import generate_rays
    from optiland_tpu.trace.tracer import trace_rays

    rays0 = generate_rays(static, params, Hxb, Hyb, Px, Py,
                          wb if not uniform_w
                          else jnp.asarray(wavelength, dtype))
    h = trace_rays(static, params, rays0)
    x, y, i = h.x[-1], h.y[-1], h.intensity[-1]
    return (jnp.sum(i), jnp.sum(x * i), jnp.sum(y * i),
            jnp.sum((x * x + y * y) * i))
