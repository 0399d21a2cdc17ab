"""Fused Pallas trace kernel: the whole surface chain in VMEM.

The XLA path materializes inter-surface ray state in HBM between fusion
boundaries, and reverse-mode AD stores its residuals there too. This kernel
runs the ENTIRE multi-surface trace for a tile of rays inside VMEM — forward
in one pass, and a custom-VJP backward that re-traces the tile and
differentiates in-register (`jax.vjp` inside the kernel body), writing only
the final state / small parameter cotangents to HBM. That is the
"one fused Pallas kernel per trace" design of SURVEY.md §7, restricted in
v1 to the hot system class:

  supported: on-axis surfaces (no tilt/decenter/abs-CS), plane / conic /
  even- & odd-asphere geometries, refract / reflect / none interactions,
  radial apertures, dispersive or ideal media, per-ray wavelengths.
  Everything else falls back to the reference-parity XLA path
  (`trace/tracer.py`), which remains the semantic oracle in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.geometry.surfaces import (
    GEOM_CONIC,
    GEOM_EVEN_ASPHERE,
    GEOM_ODD_ASPHERE,
    GEOM_PLANE,
)
from optiland_tpu.materials.dispersion import material_index
from optiland_tpu.system.spec import (
    COAT_NONE,
    INT_NONE,
    INT_REFLECT,
    SystemParams,
    SystemStatic,
)

_SUPPORTED_GEOMS = (GEOM_PLANE, GEOM_CONIC, GEOM_EVEN_ASPHERE,
                    GEOM_ODD_ASPHERE)
_EPS = 1e-12


def supports_fused(static: SystemStatic) -> bool:
    """Whether the fused kernel covers this system class."""
    return (
        not static.has_abs_cs
        and not any(static.has_tilt)
        and not any(static.has_decenter)
        and not any(static.has_absorption)
        and all(g in _SUPPORTED_GEOMS for g in static.geom_codes)
        and all(i in (0, INT_REFLECT, INT_NONE) for i in static.interactions)
        and all(c == COAT_NONE for c in static.coatings)
        and all(b is None for b in static.bsdfs)
        and static.apodization is None
        and all(m is None for m in static.aperture_masks)
    )


def _tile_trace(static: SystemStatic, cv, conic, coeffs, thickness,
                mat_coeffs, ap_radius, x, y, z, L, M, N, i, opd, w):
    """Pure per-tile trace for the supported subset — semantics identical to
    `trace/tracer.py` (validated by parity tests)."""
    S = static.num_surfaces
    pos_prev = jnp.zeros((), cv.dtype)

    def n_of(k):
        return material_index(static.mat_formulas[k], static.mat_n_coeffs[k],
                              mat_coeffs[k], w)

    n_pre = n_of(0)
    for k in range(1, S):
        # vertex position from the thickness chain (differentiable)
        pos_k = pos_prev + (thickness[k - 1] if k > 1 else 0.0)
        pos_prev = pos_k
        z = z - pos_k

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
        one = jnp.asarray(1.0, A.dtype)
        eps = jnp.asarray(_EPS, A.dtype)
        A_safe = jnp.where(jnp.abs(A) > _EPS, A, one)
        t1 = (-B + sq) / (2.0 * A_safe)
        t2 = (-B - sq) / (2.0 * A_safe)
        z1 = z + t1 * N
        z2 = z + t2 * N
        t_quad = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)
        B_safe = jnp.where(jnp.abs(B) > _EPS, B, eps)
        t = jnp.where(jnp.abs(A) > _EPS, t_quad, -C / B_safe)
        validf = jnp.where(jnp.abs(A) > _EPS, validf,
                           jnp.ones((), A.dtype))

        n_coeffs = static.geom_n_coeffs[k]
        if code in (GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE) and n_coeffs:
            # Fixed-count Newton refinement with analytic sag gradient.
            # Iterations run on a detached root, then ONE differentiable
            # step closes the graph: t* = t - F/F' with F(t)≈0 gives
            # dt/dp = -F_p/F_t — the implicit-function-theorem derivative
            # (same trick as `surfaces.intersect_implicit`), so the
            # in-kernel VJP never stores the 16-iteration chain.
            t = jax.lax.stop_gradient(t)
            for _it in range(static.newton_iters + 1):
                if _it == static.newton_iters:
                    t = jax.lax.stop_gradient(t)
                xt = x + t * L
                yt = y + t * M
                zt = z + t * N
                r2 = xt * xt + yt * yt
                root = jnp.sqrt(jnp.maximum(1.0 - kk * cvk * cvk * r2, _EPS))
                s_val = cvk * r2 / (1.0 + root)
                gmul = cvk / root
                if code == GEOM_EVEN_ASPHERE:
                    rp = r2
                    g = jnp.zeros_like(r2)
                    for ci in range(n_coeffs):
                        s_val = s_val + coeffs[k, ci] * rp
                        g = g + 2.0 * (ci + 1) * coeffs[k, ci] * (
                            rp / jnp.maximum(r2, _EPS))
                        rp = rp * r2
                    gx = xt * (gmul + g)
                    gy = yt * (gmul + g)
                else:
                    r = jnp.sqrt(jnp.maximum(r2, _EPS))
                    rpow = r
                    g = jnp.zeros_like(r)
                    for ci in range(n_coeffs):
                        s_val = s_val + coeffs[k, ci] * rpow
                        g = g + (ci + 1) * coeffs[k, ci] * rpow / r
                        rpow = rpow * r
                    gx = xt * gmul + xt / r * g
                    gy = yt * gmul + yt / r * g
                f = s_val - zt
                fp = gx * L + gy * M - N
                fp = jnp.where(jnp.abs(fp) > _EPS, fp, eps)
                t = t - f / fp

        x = x + t * L
        y = y + t * M
        z = z + t * N
        opd = opd + jnp.abs(t * n_pre)
        i = i * validf
        if static.has_aperture[k]:
            i = i * (x * x + y * y <= ap_radius[k] ** 2).astype(i.dtype)

        interaction = static.interactions[k]
        if interaction != INT_NONE:
            # surface normal (aligned into the incident direction)
            r2 = x * x + y * y
            root = jnp.sqrt(jnp.maximum(1.0 - kk * cvk * cvk * r2, _EPS))
            gmul = cvk / root
            if code in (GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE) and n_coeffs:
                if code == GEOM_EVEN_ASPHERE:
                    rp = jnp.ones_like(r2)
                    g = jnp.zeros_like(r2)
                    for ci in range(n_coeffs):
                        g = g + 2.0 * (ci + 1) * coeffs[k, ci] * rp
                        rp = rp * r2
                    gx = x * (gmul + g)
                    gy = y * (gmul + g)
                else:
                    r = jnp.sqrt(jnp.maximum(r2, _EPS))
                    rpow = jnp.ones_like(r)
                    g = jnp.zeros_like(r)
                    for ci in range(n_coeffs):
                        g = g + (ci + 1) * coeffs[k, ci] * rpow
                        rpow = rpow * r
                    gx = x * gmul + x / r * g
                    gy = y * gmul + y / r * g
            else:
                gx = gmul * x
                gy = gmul * y
            mag = jnp.sqrt(gx * gx + gy * gy + 1.0)
            nx, ny, nz = gx / mag, gy / mag, -1.0 / mag

            dot = L * nx + M * ny + N * nz
            sgn = jnp.sign(dot)
            nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
            cosi = jnp.abs(dot)

            if interaction == INT_REFLECT:
                L = L - 2.0 * cosi * nx
                M = M - 2.0 * cosi * ny
                N = N - 2.0 * cosi * nz
                n_post = n_pre
            else:
                n_post = n_of(k)
                u = n_pre / n_post
                d2 = 1.0 - u * u * (1.0 - cosi * cosi)
                okf = (d2 >= 0.0).astype(d2.dtype)
                rt = jnp.sqrt(jnp.maximum(d2, 0.0))
                Lr = u * L + nx * (rt - u * cosi)
                Mr = u * M + ny * (rt - u * cosi)
                Nr = u * N + nz * (rt - u * cosi)
                L = okf * Lr + (1.0 - okf) * L
                M = okf * Mr + (1.0 - okf) * M
                N = okf * Nr + (1.0 - okf) * N
                i = i * okf
            n_pre = n_post

        z = z + pos_k

    return x, y, z, L, M, N, i, opd


def _ray_tree(x, y, z, L, M, N, i, opd, w):
    return (x, y, z, L, M, N, i, opd, w)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_trace_final(static: SystemStatic, interpret: bool, params,
                      rays_flat):
    """Final-surface ray state via the fused kernel.

    Args:
        params: (cv, conic, coeffs, thickness, mat_coeffs, ap_radius) tuple.
        rays_flat: (x, y, z, L, M, N, i, opd, w) arrays of shape (n,).
    Returns the 8 final arrays (x, y, z, L, M, N, i, opd).
    """
    return _fused_forward(static, interpret, params, rays_flat)


def _pad_2d(a, rows, cols, fill=0.0):
    n = a.shape[0]
    pad = rows * cols - n
    return jnp.pad(a, (0, pad), constant_values=fill).reshape(rows, cols)


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


def _launch(static, interpret, params, rays_flat, kernel_body, n_outs,
            extra_inputs=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cv, conic, coeffs, thickness, mat_coeffs, ap_radius = params
    x = rays_flat[0]
    n = x.shape[0]
    LANE = 128
    TR = 32  # sublane rows per tile -> 4096 rays/tile
    tile = TR * LANE
    rows = -(-n // LANE)
    rows_pad = -(-rows // TR) * TR
    grid = rows_pad // TR

    # pad fills: N with 1 (unit direction) and w with 1 (keeps dispersion
    # formulas finite in dead lanes; their cotangent seeds are zero)
    ins = [_pad_2d(a, rows_pad, LANE, fill=(1.0 if idx in (5, 8) else 0.0))
           for idx, a in enumerate(rays_flat)]
    ins += [jnp.asarray(p) for p in
            (cv, conic, coeffs, thickness, mat_coeffs, ap_radius)]
    ins += list(extra_inputs)

    # NOTE: index-map literals must be int32 — under jax_enable_x64 a bare
    # Python 0 traces as i64, which Mosaic cannot legalize (func.return i64)
    ray_spec = pl.BlockSpec((TR, LANE), lambda g: (g, jnp.int32(0)),
                            memory_space=pltpu.VMEM)
    in_specs = ([ray_spec] * 9
                + [_full_spec(np.shape(p)) for p in
                   (cv, conic, coeffs, thickness, mat_coeffs, ap_radius)]
                + [ray_spec] * len(extra_inputs))

    out_shape = [jax.ShapeDtypeStruct((rows_pad, LANE), x.dtype)
                 for _ in range(n_outs)]
    out_specs = [ray_spec] * n_outs

    outs = pl.pallas_call(
        kernel_body,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    return [o.reshape(-1)[:n] for o in outs]


def _fused_forward(static, interpret, params, rays_flat):
    def kernel(xr, yr, zr, Lr, Mr, Nr, ir, opdr, wr,
               cvr, conicr, coeffsr, thickr, matr, apr, *outs):
        res = _tile_trace(static, cvr[:], conicr[:], coeffsr[:], thickr[:],
                          matr[:], apr[:],
                          xr[:], yr[:], zr[:], Lr[:], Mr[:], Nr[:], ir[:],
                          opdr[:], wr[:])
        for o, v in zip(outs, res):
            o[:] = v

    return tuple(_launch(static, interpret, params, rays_flat, kernel, 8))


def _fused_fwd(static, interpret, params, rays_flat):
    out = _fused_forward(static, interpret, params, rays_flat)
    return out, (params, rays_flat)


def _fused_bwd(static, interpret, res, g):
    params, rays_flat = res

    # in-kernel VJP: re-trace the tile and differentiate in VMEM
    def kernel(xr, yr, zr, Lr, Mr, Nr, ir, opdr, wr,
               cvr, conicr, coeffsr, thickr, matr, apr,
               gx, gy, gz, gL, gM, gN, gi, gopd,
               *outs):
        def f(cv, conic, coeffs, thickness, mats, x, y, z, L, M, N, i, opd):
            return _tile_trace(static, cv, conic, coeffs, thickness, mats,
                               apr[:], x, y, z, L, M, N, i, opd, wr[:])

        _, vjp = jax.vjp(f, cvr[:], conicr[:], coeffsr[:], thickr[:],
                         matr[:], xr[:], yr[:], zr[:], Lr[:], Mr[:], Nr[:],
                         ir[:], opdr[:])
        seeds = (gx[:], gy[:], gz[:], gL[:], gM[:], gN[:], gi[:], gopd[:])
        grads = vjp(seeds)
        # grads: d_cv, d_conic, d_coeffs, d_thickness, d_mats (small) then
        # d_x.. d_opd (tile-sized)
        (d_cv, d_conic, d_coeffs, d_thick, d_mats,
         d_x, d_y, d_z, d_L, d_M, d_N, d_i, d_opd) = grads

        from jax.experimental import pallas as pl

        gidx = pl.program_id(0)
        # parameter cotangents accumulate across the sequential ray-tile grid
        small = outs[8:]
        for o, v in zip(small, (d_cv, d_conic, d_coeffs, d_thick, d_mats)):
            @pl.when(gidx == 0)
            def _(o=o, v=v):
                o[:] = v

            @pl.when(gidx > 0)
            def _(o=o, v=v):
                o[:] = o[:] + v

        for o, v in zip(outs[:8], (d_x, d_y, d_z, d_L, d_M, d_N, d_i, d_opd)):
            o[:] = v

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cv, conic, coeffs, thickness, mat_coeffs, ap_radius = params
    x = rays_flat[0]
    n = x.shape[0]
    LANE = 128
    TR = 32
    rows = -(-n // LANE)
    rows_pad = -(-rows // TR) * TR
    grid = rows_pad // TR

    ins = [_pad_2d(a, rows_pad, LANE, fill=(1.0 if idx in (5, 8) else 0.0))
           for idx, a in enumerate(rays_flat)]
    ins += [jnp.asarray(p) for p in
            (cv, conic, coeffs, thickness, mat_coeffs, ap_radius)]
    gsafe = [jnp.zeros_like(x) if gg is None else gg for gg in g]
    ins += [_pad_2d(a, rows_pad, LANE) for a in gsafe]

    ray_spec = pl.BlockSpec((TR, LANE), lambda gq: (gq, jnp.int32(0)),
                            memory_space=pltpu.VMEM)

    in_specs = ([ray_spec] * 9
                + [_full_spec(np.shape(p)) for p in
                   (cv, conic, coeffs, thickness, mat_coeffs, ap_radius)]
                + [ray_spec] * 8)
    out_shape = ([jax.ShapeDtypeStruct((rows_pad, LANE), x.dtype)
                  for _ in range(8)]
                 + [jax.ShapeDtypeStruct(np.shape(p), x.dtype)
                    for p in (cv, conic, coeffs, thickness, mat_coeffs)])
    out_specs = ([ray_spec] * 8
                 + [_full_spec(np.shape(p)) for p in
                    (cv, conic, coeffs, thickness, mat_coeffs)])

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)

    d_rays = tuple(o.reshape(-1)[:n] for o in outs[:8])
    d_params = tuple(outs[8:]) + (jnp.zeros_like(jnp.asarray(ap_radius)),)
    d_w = jnp.zeros_like(rays_flat[8])
    return d_params, d_rays + (d_w,)


fused_trace_final.defvjp(_fused_fwd, _fused_bwd)


def trace_final(static: SystemStatic, params: SystemParams, rays0,
                interpret: bool = False):
    """Final-surface ray state: fused Pallas kernel when supported, XLA
    fallback otherwise. Returns a dict with x/y/z/L/M/N/intensity/opd."""
    if supports_fused(static):
        p = (params.cv, params.conic, params.coeffs, params.thickness,
             params.mat_coeffs, params.ap_radius)
        r = (rays0.x, rays0.y, rays0.z, rays0.L, rays0.M, rays0.N, rays0.i,
             rays0.opd, rays0.w)
        x, y, z, L, M, N, i, opd = fused_trace_final(static, interpret, p, r)
        return dict(x=x, y=y, z=z, L=L, M=M, N=N, intensity=i, opd=opd)
    from optiland_tpu.trace.tracer import trace_rays

    h = trace_rays(static, params, rays0)
    return dict(x=h.x[-1], y=h.y[-1], z=h.z[-1], L=h.L[-1], M=h.M[-1],
                N=h.N[-1], intensity=h.intensity[-1], opd=h.opd[-1])
