"""The real-ray trace: one fused, differentiable XLA graph.

Replaces the reference's hot path (`SurfaceGroup.trace` ->
`Surface.trace/_trace_real` -> geometry/interaction calls,
`optiland/surfaces/surface_group.py:245`, `standard_surface.py:200-274`)
with a single pure function. The per-surface loop is unrolled at trace time:
each surface's geometry/interaction/material codes are static, so XLA sees a
straight-line chain of elementwise ops over the `(num_rays,)` batch — ideal
for VPU fusion — with zero runtime dispatch. Ray batches shard over a device
mesh by simply sharding the inputs (see `optiland_tpu.parallel`).

Per-surface step (identical ordering to the reference for output parity):
  localize -> intersect (closed-form conic / fixed-K Newton) -> propagate ->
  OPD accumulate -> physical-aperture clip -> interact (refract / reflect /
  thin lens) -> globalize -> record.

The trace history (stacked per-surface records, shape (S, N)) is the
first-class output — the analogue of the reference's recorded surface data
consumed by every analysis (`surface_group.py:108-153`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from optiland_tpu.core import rays as R
from optiland_tpu.core import transforms as T
from optiland_tpu.core.rays import Rays
from optiland_tpu.geometry.surfaces import intersect, surface_normal
from optiland_tpu.materials.dispersion import material_index
from optiland_tpu.system.spec import (
    INT_DIFFRACT,
    INT_NONE,
    INT_PHASE,
    INT_REFLECT,
    INT_THIN_LENS,
    PHASE_CONSTANT,
    PHASE_LINEAR_GRATING,
    PHASE_RADIAL,
    SystemParams,
    SystemStatic,
    positions_of,
)
from optiland_tpu.trace.raygen import generate_rays


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TraceHistory:
    """Per-surface ray records, shape (S, N) each — the reference's stacked
    `surface_group.x/y/z/L/M/N/intensity/opd` properties."""

    x: jax.Array
    y: jax.Array
    z: jax.Array
    L: jax.Array
    M: jax.Array
    N: jax.Array
    intensity: jax.Array
    opd: jax.Array
    # final polarization ray-tracing matrices (N, 3, 3); None for
    # unpolarized traces
    p: jax.Array | None = None

    @property
    def num_surfaces(self) -> int:
        return self.x.shape[0]

    def final_rays(self, wavelength=None) -> Rays:
        w = jnp.zeros_like(self.x[-1]) if wavelength is None else wavelength
        return Rays(
            x=self.x[-1], y=self.y[-1], z=self.z[-1],
            L=self.L[-1], M=self.M[-1], N=self.N[-1],
            i=self.intensity[-1], opd=self.opd[-1],
            w=jnp.broadcast_to(w, self.x[-1].shape),
        )


def _thin_lens_interact(rays: Rays, f, n1, n2) -> Rays:
    """Ideal thin-lens bending for real rays (reference
    `interactions/thin_lens_interaction_model.py:24`): ray height is
    preserved, image-side slope satisfies the ideal lens equation in the
    paraxial tangent space applied to the real direction components, and
    the lens's quadratic phase transformation is applied to the OPD
    (`thin_lens_interaction_model.py:71`) so a perfect lens images with
    zero wavefront error."""
    # tangent-space slopes
    ux = rays.L / rays.N
    uy = rays.M / rays.N
    ux2 = (n1 * ux - rays.x / f) / n2
    uy2 = (n1 * uy - rays.y / f) / n2
    N2 = 1.0 / jnp.sqrt(1.0 + ux2**2 + uy2**2)
    opd = rays.opd - (rays.x**2 + rays.y**2) / (2.0 * f)
    return rays.replace(L=ux2 * N2, M=uy2 * N2, N=N2, opd=opd)


def _grating_interact(static, params, k, rays: Rays, n1, n2) -> Rays:
    """Grating diffraction step (reference `interactions/diffractive_model.py:
    28-61`): grating vector from groove orientation, period corrected by the
    in-plane projection, then the vector grating equation.

    Matches the reference's conventions: plane gratings use
    f = (-sin a, cos a, 0) (`geometries/plane_grating.py:113-132`); curved
    standard gratings use f = -(n_up x t)/|...| with t the groove tangent
    lifted onto the surface (`standard_grating.py:233-256`).
    """
    import optiland_tpu.geometry.surfaces as G

    m = params.grating[k, 0]
    d = params.grating[k, 1]
    angle = params.grating[k, 2]
    code = static.geom_codes[k]
    reflective = static.is_reflective[k]

    if code == G.GEOM_PLANE:
        nx = jnp.zeros_like(rays.x)
        ny = jnp.zeros_like(rays.x)
        nz = jnp.ones_like(rays.x)
        fx = -jnp.sin(angle) * jnp.ones_like(rays.x)
        fy = jnp.cos(angle) * jnp.ones_like(rays.x)
        fz = jnp.zeros_like(rays.x)
    else:
        nx, ny, nz = G.surface_normal(
            code, static.geom_n_coeffs[k], rays.x, rays.y,
            params.cv[k], params.conic[k], params.coeffs[k],
            aux=static.geom_aux[k],
        )
        # groove tangent lifted onto the surface, then f = -(n_up x t)
        _, gx, gy = G.sag_and_grad(
            code, static.geom_n_coeffs[k], rays.x, rays.y,
            params.cv[k], params.conic[k], params.coeffs[k],
            aux=static.geom_aux[k],
        )
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        tx, ty, tz = ca, sa, gx * ca + gy * sa
        # surface_normal returns nz < 0; the reference builds f from the
        # upward normal
        ux, uy, uz = -nx, -ny, -nz
        fx = uy * tz - uz * ty
        fy = uz * tx - ux * tz
        fz = ux * ty - uy * tx
        mag = jnp.sqrt(fx * fx + fy * fy + fz * fz)
        fx, fy, fz = -fx / mag, -fy / mag, -fz / mag

    # projection-corrected period (reference `diffractive_model.py:50-51`)
    pp = d / jnp.sqrt(fx * fx + fy * fy)
    return R.grating_diffract(rays, nx, ny, nz, fx, fy, fz, m, pp, n1, n2,
                              reflective)


def _apply_coating(static, params, k, rays: Rays, k0_dirs, n1, n2) -> Rays:
    """Coating + polarization update after the interaction.

    Reference semantics (`interactions/base.py:111-128`, `coatings.py`):
      - SimpleCoating scales intensity by T (or R on mirrors) and — reference
        quirk preserved — skips the PRT basis-rotation update;
      - polarized coatings build a Jones matrix and compose it into the
        per-ray PRT matrix;
      - no coating: PRT gets the pure geometric rotation (identity Jones).
    Unpolarized traces ignore everything except SimpleCoating's intensity
    scale (RealRays.update() is a no-op in the reference).
    """
    from optiland_tpu.polarization import jones as J
    from optiland_tpu.polarization.prt import surface_prt
    from optiland_tpu.system.spec import (
        COAT_DIATTENUATOR,
        COAT_FRESNEL,
        COAT_LINEAR_POLARIZER,
        COAT_NONE,
        COAT_POLARIZER_H,
        COAT_POLARIZER_LCP,
        COAT_POLARIZER_RCP,
        COAT_POLARIZER_V,
        COAT_RETARDER,
        COAT_SIMPLE,
        COAT_THIN_FILM,
    )

    coat = static.coatings[k]
    interaction = static.interactions[k]
    if interaction == INT_NONE:
        return rays
    reflective = interaction == INT_REFLECT

    if coat == COAT_SIMPLE:
        cp = params.coating_params[k]
        scale = cp[1] if reflective else cp[0]
        return rays.replace(i=rays.i * scale)

    if rays.p is None:
        return rays

    k0 = jnp.stack(k0_dirs, axis=-1)
    k1 = jnp.stack([rays.L, rays.M, rays.N], axis=-1)

    if coat == COAT_NONE:
        jm = None
    elif coat in (COAT_FRESNEL, COAT_THIN_FILM):
        nxv, nyv, nzv = surface_normal(
            static.geom_codes[k], static.geom_n_coeffs[k], rays.x, rays.y,
            params.cv[k], params.conic[k], params.coeffs[k],
            aux=static.geom_aux[k],
        )
        dot = jnp.abs(nxv * k0_dirs[0] + nyv * k0_dirs[1] + nzv * k0_dirs[2])
        aoi = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        if coat == COAT_THIN_FILM:
            # TMM-backed surface coating (reference ThinFilmCoating,
            # `optiland/coatings.py:488-605`): diagonal s/p Jones from the
            # stack's complex amplitude coefficients at the per-ray AOI
            jm = static.thin_films[k].jones_matrices(
                k0, k1, rays.w, aoi, reflect=reflective)
        else:
            jm = J.fresnel(k0, k1, aoi, n1, n2, reflect=reflective)
    elif coat == COAT_POLARIZER_H:
        jm = J.polarizer_h(k0, k1)
    elif coat == COAT_POLARIZER_V:
        jm = J.polarizer_v(k0, k1)
    elif coat == COAT_POLARIZER_RCP:
        jm = J.polarizer_rcp(k0, k1)
    elif coat == COAT_POLARIZER_LCP:
        jm = J.polarizer_lcp(k0, k1)
    elif coat == COAT_RETARDER:
        cp = params.coating_params[k]
        axis = [jnp.cos(cp[1]), jnp.sin(cp[1]), 0.0]
        jm = J.linear_retarder(k0, k1, cp[0], axis)
    elif coat == COAT_DIATTENUATOR:
        cp = params.coating_params[k]
        axis = [jnp.cos(cp[2]), jnp.sin(cp[2]), 0.0]
        jm = J.linear_diattenuator(k0, k1, cp[0], cp[1], axis)
    elif coat == COAT_LINEAR_POLARIZER:
        cp = params.coating_params[k]
        axis = [jnp.cos(cp[0]), jnp.sin(cp[0]), 0.0]
        jm = J.linear_polarizer(k0, k1, axis)
    else:
        raise ValueError(f"Unknown coating code {coat}")

    p_surf = surface_prt(k0, k1, jm)
    return rays.replace(p=jnp.einsum("nij,njk->nik", p_surf, rays.p))


def _phase_value_grad(static, params, k, x, y, w):
    """Phase (radians) and its (x, y) gradient for a phase surface
    (reference `phase/{constant,radial,linear_grating,grid,
    height_profile}.py`); shared with the paraxial engine in
    `trace/phase.py`."""
    from optiland_tpu.trace.phase import phase_value_grad

    return phase_value_grad(static, params, k, x, y, w)


def _phase_interact(static, params, k, rays: Rays, n1, n2) -> Rays:
    """Generalized Snell's law for a thin phase sheet on ANY geometry
    (reference `interactions/phase_interaction_model.py:45-131`): project
    the phase gradient and the incident wavevector onto the surface tangent
    plane, add them, and rebuild the normal component from |k_out| = n2 k0.

    Deliberate deviation: the reference hard-codes alpha along +N, which is
    only correct for its Plane normal (0,0,+1); on curved carriers (whose
    geometry normal has nz<0, `standard.py:164-168`) the reference emits
    BACKWARD-travelling rays (N=-1). Here the outgoing normal component
    follows the incident one (`sign(k_in . n)`), so transmission continues
    forward on every carrier geometry.
    """
    reflective = static.is_reflective[k]
    if reflective:
        n2 = n1
    k0 = 2.0 * jnp.pi / (rays.w * 1e-3)  # wavenumber in 1/mm

    # local surface normal of the carrier geometry (plane, conic, freeform)
    nx, ny, nz = surface_normal(
        static.geom_codes[k], static.geom_n_coeffs[k],
        rays.x, rays.y, params.cv[k], params.conic[k], params.coeffs[k],
        aux=static.geom_aux[k],
    )

    # ambient phase gradient (profiles are functions of (x, y): z-grad 0)
    phase, gx, gy = _phase_value_grad(static, params, k, rays.x, rays.y,
                                      rays.w)
    gz = jnp.zeros_like(gx)

    # tangential projections: G = grad(phi) - (grad(phi).N) N and
    # k_par = k_in - (k_in.N) N
    g_dot_n = gx * nx + gy * ny + gz * nz
    Gx, Gy, Gz = gx - g_dot_n * nx, gy - g_dot_n * ny, gz - g_dot_n * nz
    kix = n1 * k0 * rays.L
    kiy = n1 * k0 * rays.M
    kiz = n1 * k0 * rays.N
    ki_dot_n = kix * nx + kiy * ny + kiz * nz
    kpx = kix - ki_dot_n * nx + Gx
    kpy = kiy - ki_dot_n * ny + Gy
    kpz = kiz - ki_dot_n * nz + Gz

    R_sq = (n2 * k0) ** 2 - (kpx**2 + kpy**2 + kpz**2)
    ok = R_sq >= 0.0
    alpha = jnp.sqrt(jnp.maximum(R_sq, 0.0))
    # refraction keeps going along the incident normal component; reflection
    # reverses it (the reference's +N/-N choice with its downward normal;
    # our normal convention follows the incident side via sign(ki.N))
    sign = (-1.0 if reflective else 1.0) * jnp.sign(ki_dot_n)
    alpha = sign * alpha
    k_out_x = kpx + alpha * nx
    k_out_y = kpy + alpha * ny
    k_out_z = kpz + alpha * nz
    mag = jnp.sqrt(k_out_x**2 + k_out_y**2 + k_out_z**2)
    return rays.replace(
        L=jnp.where(ok, k_out_x / mag, rays.L),
        M=jnp.where(ok, k_out_y / mag, rays.M),
        N=jnp.where(ok, k_out_z / mag, rays.N),
        i=jnp.where(ok, rays.i, jnp.zeros_like(rays.i)),
        opd=rays.opd - phase / k0,
    )


def trace_rays(static: SystemStatic, params: SystemParams, rays0: Rays,
               scatter_key=None) -> TraceHistory:
    """Trace a starting bundle through all surfaces; returns the history.

    Row 0 of the history is the starting bundle (the reference records rays
    at the object surface as they are generated).
    """
    S = static.num_surfaces
    pos = positions_of(static, params)
    if scatter_key is None and any(b is not None for b in static.bsdfs):
        scatter_key = jax.random.PRNGKey(0)

    # refractive index of the medium before surface k = material after k-1
    def n_of(k, w):
        return material_index(
            static.mat_formulas[k], static.mat_n_coeffs[k], params.mat_coeffs[k], w
        )

    rays = rays0
    records = [rays0]

    for k in range(1, S):
        if static.has_abs_cs:
            tx = params.cs_pos[k, 0]
            ty = params.cs_pos[k, 1]
        else:
            tx = params.decenter[k, 0]
            ty = params.decenter[k, 1]
        tz = pos[k]
        tilted = static.has_tilt[k]
        decentered = static.has_decenter[k]

        if tilted:
            rays = T.localize(rays, tx, ty, tz,
                              params.tilt[k, 0], params.tilt[k, 1], params.tilt[k, 2])
        elif decentered:
            rays = rays.replace(x=rays.x - tx, y=rays.y - ty, z=rays.z - tz)
        else:
            rays = T.translate_z(rays, tz)

        # intersect + propagate; Newton-refined geometries use the
        # implicit-function-theorem VJP (backward differentiates the
        # converged root, not the iteration chain)
        from optiland_tpu.geometry.surfaces import (
            _CLOSED_FORM,
            GEOM_GRID_SAG,
            GEOM_NURBS,
            _conic_intersect,
            _grid_interp,
            intersect_implicit,
        )

        code = static.geom_codes[k]
        if (code in _CLOSED_FORM or static.geom_n_coeffs[k] == 0
                or code == GEOM_NURBS):
            # NURBS uses the two-plane Newton directly: its validity is the
            # converged residual, and the unrolled fixed-count Newton is the
            # cheapest correct derivative path (the implicit VJP's backward
            # sag eval would itself be an inner Newton).
            t, valid = intersect(
                code, static.geom_n_coeffs[k],
                rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
                params.cv[k], params.conic[k], params.coeffs[k],
                newton_iters=static.newton_iters, aux=static.geom_aux[k],
            )
        else:
            t = intersect_implicit(
                code, static.geom_n_coeffs[k], static.newton_iters,
                static.geom_aux[k], params.cv[k], params.conic[k],
                params.coeffs[k], rays.x, rays.y, rays.z,
                rays.L, rays.M, rays.N,
            )
            _, valid = _conic_intersect(rays.x, rays.y, rays.z, rays.L,
                                        rays.M, rays.N, params.cv[k],
                                        params.conic[k])
            if code == GEOM_GRID_SAG:
                aux = static.geom_aux[k]
                _, _, _, oob = _grid_interp(
                    rays.x + t * rays.L, rays.y + t * rays.M,
                    params.coeffs[k], aux[0], aux[1])
                valid = valid & ~oob
        n_pre = n_of(k - 1, rays.w)
        rays = R.propagate(rays, t)
        new_i = jnp.where(valid, rays.i, jnp.zeros_like(rays.i))
        if static.has_absorption[k - 1]:
            # Beer-Lambert attenuation through the absorbing medium before
            # this surface (reference `propagation/homogeneous.py:44-53`);
            # k(w) interpolated from the material's tabulated extinction
            kv = jnp.interp(rays.w, params.k_wl[k - 1], params.k_val[k - 1])
            alpha = 4.0 * jnp.pi * kv / rays.w
            new_i = new_i * jnp.exp(-alpha * t * 1e3)
        rays = rays.replace(
            opd=rays.opd + jnp.abs(t * n_pre),
            i=new_i,
        )

        # physical aperture clip — zero intensity, keep tracing
        if static.has_aperture[k]:
            mask = (static.aperture_masks[k]
                    if k < len(static.aperture_masks) else None)
            if mask is not None:
                rays = R.clip(rays, mask.clip(rays.x, rays.y))
            else:
                r2 = rays.x**2 + rays.y**2
                rays = R.clip(rays, r2 > params.ap_radius[k] ** 2)

        k0_dirs = (rays.L, rays.M, rays.N)  # pre-interaction directions

        interaction = static.interactions[k]
        if interaction == INT_NONE:
            pass
        elif interaction == INT_REFLECT:
            nx, ny, nz = surface_normal(
                static.geom_codes[k], static.geom_n_coeffs[k],
                rays.x, rays.y, params.cv[k], params.conic[k], params.coeffs[k],
                aux=static.geom_aux[k],
            )
            rays = R.reflect(rays, nx, ny, nz)
        elif interaction == INT_THIN_LENS:
            rays = _thin_lens_interact(
                rays, params.focal_length[k], n_pre, n_of(k, rays.w)
            )
        elif interaction == INT_DIFFRACT:
            rays = _grating_interact(static, params, k, rays, n_pre,
                                     n_of(k, rays.w))
        elif interaction == INT_PHASE:
            rays = _phase_interact(static, params, k, rays, n_pre,
                                   n_of(k, rays.w))
        else:
            nx, ny, nz = surface_normal(
                static.geom_codes[k], static.geom_n_coeffs[k],
                rays.x, rays.y, params.cv[k], params.conic[k], params.coeffs[k],
                aux=static.geom_aux[k],
            )
            rays = R.refract(rays, nx, ny, nz, n_pre, n_of(k, rays.w))

        if static.bsdfs[k] is not None:
            from optiland_tpu.core.scatter import scatter_directions

            b = static.bsdfs[k]
            nx_s, ny_s, nz_s = surface_normal(
                static.geom_codes[k], static.geom_n_coeffs[k],
                rays.x, rays.y, params.cv[k], params.conic[k],
                params.coeffs[k], aux=static.geom_aux[k],
            )
            Ls, Ms, Ns = scatter_directions(
                jax.random.fold_in(scatter_key, k), rays.L, rays.M, rays.N,
                nx_s, ny_s, nz_s, kind=b.kind, sigma=b.sigma,
            )
            rays = rays.replace(L=Ls, M=Ms, N=Ns)

        rays = _apply_coating(static, params, k, rays, k0_dirs, n_pre,
                              n_of(k, rays.w))

        if tilted:
            rays = T.globalize(rays, tx, ty, tz,
                               params.tilt[k, 0], params.tilt[k, 1], params.tilt[k, 2])
        elif decentered:
            rays = rays.replace(x=rays.x + tx, y=rays.y + ty, z=rays.z + tz)
        else:
            rays = T.untranslate_z(rays, tz)

        records.append(rays)

    stack = lambda f: jnp.stack([f(r) for r in records])  # noqa: E731
    return TraceHistory(
        x=stack(lambda r: r.x), y=stack(lambda r: r.y), z=stack(lambda r: r.z),
        L=stack(lambda r: r.L), M=stack(lambda r: r.M), N=stack(lambda r: r.N),
        intensity=stack(lambda r: r.i), opd=stack(lambda r: r.opd),
        p=rays.p,
    )


def trace_system_final(static: SystemStatic, params: SystemParams, Hx, Hy,
                       Px, Py, wavelength, apply_vignetting: bool = True,
                       outputs=None):
    """Generate + aim + trace, returning ONLY the final-surface state.

    This is the optimization/bench hot path: when the system class is
    supported and we're on TPU hardware, the whole surface chain runs as
    one fused Pallas kernel (`trace/fused.py`) — no (S, N) history is
    materialized in HBM and the backward differentiates in-register.
    Falls back to the XLA tracer otherwise. Returns a dict with
    x/y/z/L/M/N/intensity/opd arrays of shape (N,).
    """
    from optiland_tpu.trace.fused import (
        on_tpu,
        supports_fused,
        supports_fused_raygen,
        trace_final,
        trace_system_final_fused,
    )

    if (supports_fused(static) and supports_fused_raygen(static) and on_tpu()
            and params.cv.dtype == jnp.float32):
        # one kernel launch: raygen fused into the trace tile
        return trace_system_final_fused(static, params, Hx, Hy, Px, Py,
                                        wavelength, outputs=outputs)
    rays0 = generate_rays(static, params, Hx, Hy, Px, Py, wavelength,
                          apply_vignetting=apply_vignetting)
    if supports_fused(static) and on_tpu():
        return trace_final(static, params, rays0, wavelength=wavelength)
    h = trace_rays(static, params, rays0)
    return dict(x=h.x[-1], y=h.y[-1], z=h.z[-1], L=h.L[-1], M=h.M[-1],
                N=h.N[-1], intensity=h.intensity[-1], opd=h.opd[-1])


def trace_system(static: SystemStatic, params: SystemParams, Hx, Hy, Px, Py,
                 wavelength, apply_vignetting: bool = True,
                 polarization=None) -> TraceHistory:
    """Generate + aim + trace in one jittable call (the reference's
    `RealRayTracer.trace` / `trace_generic`, `raytrace/real_ray_tracer.py:58`).

    `polarization`: None for a scalar trace, or a PolarizationState (incl.
    `PolarizationState.unpolarized()`) for a PRT trace — the final intensity
    row is then computed from the PRT matrices and the state (reference
    `real_ray_tracer.py:113`), masked by the traced intensity so clipped/TIR
    rays stay dark."""
    rays0 = generate_rays(static, params, Hx, Hy, Px, Py, wavelength,
                          apply_vignetting=apply_vignetting,
                          polarized=polarization is not None)
    from optiland_tpu.trace.fused import (
        on_tpu,
        supports_fused,
        trace_history_fused,
    )

    if polarization is None and supports_fused(static) and on_tpu():
        hist = trace_history_fused(static, params, rays0)
    else:
        hist = trace_rays(static, params, rays0)
    if polarization is not None:
        from optiland_tpu.polarization.prt import intensity_from_prt

        k0 = jnp.stack([rays0.L, rays0.M, rays0.N], axis=-1)
        i_pol = intensity_from_prt(hist.p, k0, rays0.i, polarization)
        mask = (hist.intensity[-1] > 0).astype(i_pol.dtype)
        hist = TraceHistory(
            x=hist.x, y=hist.y, z=hist.z, L=hist.L, M=hist.M, N=hist.N,
            intensity=hist.intensity.at[-1].set(i_pol * mask),
            opd=hist.opd, p=hist.p,
        )
    return hist
