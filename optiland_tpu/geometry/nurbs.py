"""NURBS surface kernels: basis functions, point/derivative eval, inversion.

TPU-native counterpart of the reference NURBS geometry
(`optiland/geometries/nurbs/{nurbs_geometry,nurbs_basis_functions,
nurbs_fitting}.py`, SURVEY.md §2.3/§2.16). The reference evaluates B-spline
bases with Numba-jitted loops and intersects rays by a tolerance-terminated
two-plane Newton with *random restarts* for out-of-domain parameters; here:

  - basis/derivative evaluation (Piegl & Tiller A2.2 + the degree-reduction
    derivative identity) is unrolled over the *static* degree, with the knot
    span found by `searchsorted` — one fused gather+FMA chain per ray,
  - the (u, v) Newton runs a fixed iteration count with *clamping* to the
    valid parameter square instead of random restarts (deterministic,
    jit-compatible, differentiable),
  - fitting a conic to a NURBS patch (the reference's `fit_surface`) is a
    host-side numpy least-squares on a Greville-anchored control net.

Surface model: S(u, v) = sum_ij N_i(u) N_j(v) w_ij P_ij / sum_ij N_i N_j w_ij
with P packed as (3, nu, nv) control coordinates.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_EPS = 1e-14


def find_span(knots, degree: int, n_ctrl: int, t):
    """Knot span index i such that knots[i] <= t < knots[i+1], clipped to the
    valid range [degree, n_ctrl-1] (handles t at the domain ends)."""
    span = jnp.searchsorted(knots, t, side="right") - 1
    return jnp.clip(span, degree, n_ctrl - 1)


def basis_funs(knots, degree: int, span, t):
    """Nonzero basis values [N_{span-degree,p}, ..., N_{span,p}] at t
    (Piegl & Tiller algorithm A2.2, unrolled over the static degree)."""
    left = {}
    right = {}
    N = [jnp.ones_like(t)]
    for j in range(1, degree + 1):
        left[j] = t - jnp.take(knots, span + 1 - j)
        right[j] = jnp.take(knots, span + j) - t
        saved = jnp.zeros_like(t)
        new_N = []
        for r in range(j):
            den = right[r + 1] + left[j - r]
            den = jnp.where(jnp.abs(den) > _EPS, den, 1.0)
            temp = N[r] / den
            new_N.append(saved + right[r + 1] * temp)
            saved = left[j - r] * temp
        new_N.append(saved)
        N = new_N
    return N


def basis_and_deriv(knots, degree: int, span, t):
    """(N, dN): nonzero basis values and first derivatives at t.

    Derivatives via N'_{i,p} = p [ N_{i,p-1}/(U_{i+p}-U_i)
                                 - N_{i+1,p-1}/(U_{i+p+1}-U_{i+1}) ].
    """
    N = basis_funs(knots, degree, span, t)
    if degree == 0:
        return N, [jnp.zeros_like(t)]
    Nm = basis_funs(knots, degree - 1, span, t)  # N_{span-p+1+q, p-1}
    dN = []
    for r in range(degree + 1):
        i = span - degree + r
        if r >= 1:
            den_a = jnp.take(knots, i + degree) - jnp.take(knots, i)
            a = Nm[r - 1] / jnp.where(jnp.abs(den_a) > _EPS, den_a, 1.0)
        else:
            a = jnp.zeros_like(t)
        if r <= degree - 1:
            den_b = jnp.take(knots, i + degree + 1) - jnp.take(knots, i + 1)
            b = Nm[r] / jnp.where(jnp.abs(den_b) > _EPS, den_b, 1.0)
        else:
            b = jnp.zeros_like(t)
        dN.append(degree * (a - b))
    return N, dN


def surface_eval(U, V, W, Px, Py, Pz, p: int, q: int, nu: int, nv: int,
                 u, v, derivs: bool = True):
    """Evaluate S(u, v) (and optionally S_u, S_v) for ray-batched (u, v).

    Control arrays are flattened (nu*nv,) in u-major order. Returns
    (S, S_u, S_v) where each is a tuple (x, y, z) of per-ray arrays.
    """
    su = find_span(U, p, nu, u)
    sv = find_span(V, q, nv, v)
    if derivs:
        Bu, dBu = basis_and_deriv(U, p, su, u)
        Bv, dBv = basis_and_deriv(V, q, sv, v)
    else:
        Bu, Bv = basis_funs(U, p, su, u), basis_funs(V, q, sv, v)
        dBu = dBv = None

    zero = jnp.zeros_like(u)
    num = [zero, zero, zero]
    den = zero
    num_u = [zero, zero, zero]
    den_u = zero
    num_v = [zero, zero, zero]
    den_v = zero
    P3 = (Px, Py, Pz)
    for a in range(p + 1):
        iu = su - p + a
        for b in range(q + 1):
            iv = sv - q + b
            idx = iu * nv + iv
            w_ab = jnp.take(W, idx)
            bb = Bu[a] * Bv[b] * w_ab
            Pg = [jnp.take(P3[c], idx) for c in range(3)]
            for c in range(3):
                num[c] = num[c] + bb * Pg[c]
            den = den + bb
            if derivs:
                bu = dBu[a] * Bv[b] * w_ab
                bv = Bu[a] * dBv[b] * w_ab
                for c in range(3):
                    num_u[c] = num_u[c] + bu * Pg[c]
                    num_v[c] = num_v[c] + bv * Pg[c]
                den_u = den_u + bu
                den_v = den_v + bv

    den_safe = jnp.where(jnp.abs(den) > _EPS, den, 1.0)
    S = tuple(n / den_safe for n in num)
    if not derivs:
        return S, None, None
    S_u = tuple((num_u[c] - S[c] * den_u) / den_safe for c in range(3))
    S_v = tuple((num_v[c] - S[c] * den_v) / den_safe for c in range(3))
    return S, S_u, S_v


def _solve2(a, b, c, d, r1, r2):
    """Solve [[a, b], [c, d]] [du, dv] = [r1, r2] per ray (safe det)."""
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) > _EPS, det, jnp.where(det >= 0, _EPS, -_EPS))
    du = (d * r1 - b * r2) / det
    dv = (a * r2 - c * r1) / det
    return du, dv


def invert_xy(U, V, W, Px, Py, Pz, p, q, nu, nv, box, x, y, iters: int = 8):
    """Newton inversion of the (x, y) chart: find (u, v) with S_xy(u,v)=(x,y).

    `box` = (x0, x1, y0, y1) static floats giving the patch footprint for the
    initial guess. Parameters are clamped to [0, 1] each step (the jit-safe
    replacement for the reference's random restarts,
    `nurbs_geometry.py:733-762`)."""
    x0, x1, y0, y1 = box
    u = jnp.clip((x - x0) / max(x1 - x0, _EPS), 0.0, 1.0)
    v = jnp.clip((y - y0) / max(y1 - y0, _EPS), 0.0, 1.0)
    for _ in range(iters):
        S, S_u, S_v = surface_eval(U, V, W, Px, Py, Pz, p, q, nu, nv, u, v)
        du, dv = _solve2(S_u[0], S_v[0], S_u[1], S_v[1], S[0] - x, S[1] - y)
        u = jnp.clip(u - du, 0.0, 1.0)
        v = jnp.clip(v - dv, 0.0, 1.0)
    return u, v


def sag_and_grad_xy(U, V, W, Px, Py, Pz, p, q, nu, nv, box, x, y,
                    iters: int = 8):
    """(z, dz/dx, dz/dy) of the NURBS graph z(x, y) at the converged (u, v).

    The gradient chains through the inverse chart:
    [dz/dx, dz/dy] = [z_u, z_v] · [[x_u, x_v], [y_u, y_v]]^{-1}.
    """
    u, v = invert_xy(U, V, W, Px, Py, Pz, p, q, nu, nv, box, x, y, iters)
    S, S_u, S_v = surface_eval(U, V, W, Px, Py, Pz, p, q, nu, nv, u, v)
    # gx = [z_u z_v] J^{-1} with J = [[x_u, x_v], [y_u, y_v]]
    a, b, c, d = S_u[0], S_v[0], S_u[1], S_v[1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) > _EPS, det, jnp.where(det >= 0, _EPS, -_EPS))
    gx = (S_u[2] * d - S_v[2] * c) / det
    gy = (-S_u[2] * b + S_v[2] * a) / det
    return S[2], gx, gy


def intersect_two_plane(U, V, W, Px, Py, Pz, p, q, nu, nv, box,
                        x, y, z, L, M, N, iters: int = 12):
    """Ray/NURBS intersection via the two-plane formulation (Martin et al.,
    "Practical ray tracing of trimmed NURBS surfaces"; reference
    `nurbs_geometry.py:763-830`). Returns (t, valid).

    The ray is the intersection of two planes with normals N1, N2; Newton
    solves N1·S + d1 = 0, N2·S + d2 = 0 in (u, v). t is the *signed*
    projection of S - P0 on the ray direction (the reference returns the
    unsigned distance)."""
    # N1 perpendicular to the ray, chosen by the dominant direction component
    mask = (L > M) & (L > N)
    mag_lm = jnp.sqrt(L * L + M * M)
    mag_nm = jnp.sqrt(N * N + M * M)
    mag_lm = jnp.where(mag_lm > _EPS, mag_lm, 1.0)
    mag_nm = jnp.where(mag_nm > _EPS, mag_nm, 1.0)
    n1x = jnp.where(mask, M / mag_lm, 0.0)
    n1y = jnp.where(mask, -L / mag_lm, N / mag_nm)
    n1z = jnp.where(mask, 0.0, -M / mag_nm)
    # N2 = N1 x d
    n2x = n1y * N - n1z * M
    n2y = n1z * L - n1x * N
    n2z = n1x * M - n1y * L
    d1 = -(n1x * x + n1y * y + n1z * z)
    d2 = -(n2x * x + n2y * y + n2z * z)

    # initial guess: the ray's z=0 footprint mapped through the patch box
    x0b, x1b, y0b, y1b = box
    N_safe = jnp.where(jnp.abs(N) > _EPS, N, 1.0)
    t0 = -z / N_safe
    u = jnp.clip((x + t0 * L - x0b) / max(x1b - x0b, _EPS), 0.0, 1.0)
    v = jnp.clip((y + t0 * M - y0b) / max(y1b - y0b, _EPS), 0.0, 1.0)

    for _ in range(iters):
        S, S_u, S_v = surface_eval(U, V, W, Px, Py, Pz, p, q, nu, nv, u, v)
        r1 = n1x * S[0] + n1y * S[1] + n1z * S[2] + d1
        r2 = n2x * S[0] + n2y * S[1] + n2z * S[2] + d2
        a = n1x * S_u[0] + n1y * S_u[1] + n1z * S_u[2]
        b = n1x * S_v[0] + n1y * S_v[1] + n1z * S_v[2]
        c = n2x * S_u[0] + n2y * S_u[1] + n2z * S_u[2]
        dd = n2x * S_v[0] + n2y * S_v[1] + n2z * S_v[2]
        du, dv = _solve2(a, b, c, dd, r1, r2)
        u = jnp.clip(u - du, 0.0, 1.0)
        v = jnp.clip(v - dv, 0.0, 1.0)

    S, _, _ = surface_eval(U, V, W, Px, Py, Pz, p, q, nu, nv, u, v,
                           derivs=False)
    r1 = n1x * S[0] + n1y * S[1] + n1z * S[2] + d1
    r2 = n2x * S[0] + n2y * S[1] + n2z * S[2] + d2
    scale = 1.0 + jnp.abs(S[0]) + jnp.abs(S[1]) + jnp.abs(S[2])
    valid = (jnp.abs(r1) + jnp.abs(r2)) < 1e-4 * scale
    t = (S[0] - x) * L + (S[1] - y) * M + (S[2] - z) * N
    return t, valid


# ---------------------------------------------------------------------------
# Host-side construction helpers (numpy)
# ---------------------------------------------------------------------------


def clamped_uniform_knots(n_ctrl: int, degree: int) -> np.ndarray:
    """Clamped knot vector with uniformly spaced interior knots on [0, 1]."""
    n_interior = n_ctrl - degree - 1
    interior = np.linspace(0.0, 1.0, n_interior + 2)[1:-1]
    return np.concatenate([np.zeros(degree + 1), interior,
                           np.ones(degree + 1)])


def greville(knots: np.ndarray, degree: int, n_ctrl: int) -> np.ndarray:
    """Greville abscissae: the natural parameter anchor of each control point."""
    return np.array([knots[i + 1: i + degree + 1].mean()
                     for i in range(n_ctrl)])


def _basis_matrix_np(knots: np.ndarray, degree: int, n_ctrl: int,
                     ts: np.ndarray) -> np.ndarray:
    """Dense (len(ts), n_ctrl) B-spline collocation matrix (Cox-de Boor)."""
    B = np.zeros((len(ts), n_ctrl))
    for col in range(n_ctrl):
        c = np.zeros(n_ctrl)
        c[col] = 1.0
        # de Boor evaluation per sample (host-side, small)
        for row, t in enumerate(ts):
            B[row, col] = _deboor_np(knots, degree, n_ctrl, c, t)
    return B


def _deboor_np(knots, degree, n_ctrl, coeffs, t):
    span = int(np.clip(np.searchsorted(knots, t, side="right") - 1,
                       degree, n_ctrl - 1))
    d = [coeffs[j + span - degree] for j in range(degree + 1)]
    for r in range(1, degree + 1):
        for j in range(degree, r - 1, -1):
            i = j + span - degree
            den = knots[i + 1 + degree - r] - knots[i]
            alpha = 0.0 if den == 0 else (t - knots[i]) / den
            d[j] = (1.0 - alpha) * d[j - 1] + alpha * d[j]
    return d[degree]


def fit_nurbs_to_sag(sag_fn, x0, x1, y0, y1, nu: int, nv: int,
                     p: int = 3, q: int = 3, n_samples: int = 24):
    """Least-squares B-spline fit of z = sag_fn(x, y) over [x0,x1]x[y0,y1].

    Returns (U, V, W, Px, Py, Pz) with the control net's (x, y) anchored on
    Greville abscissae so the (u, v) -> (x, y) chart is near-affine (fast,
    well-conditioned Newton inversion). The reference's analogue is
    `nurbs_fitting.py` driven by `NurbsGeometry.fit_surface`."""
    p = min(p, nu - 1)
    q = min(q, nv - 1)
    U = clamped_uniform_knots(nu, p)
    V = clamped_uniform_knots(nv, q)
    gu = greville(U, p, nu)
    gv = greville(V, q, nv)

    us = np.linspace(0.0, 1.0, n_samples)
    vs = np.linspace(0.0, 1.0, n_samples)
    Bu = _basis_matrix_np(U, p, nu, us)
    Bv = _basis_matrix_np(V, q, nv, vs)

    # sample the target sag on the parameter grid mapped affinely to the box
    Xs = x0 + us[:, None] * (x1 - x0) + 0.0 * vs[None, :]
    Ys = y0 + 0.0 * us[:, None] + vs[None, :] * (y1 - y0)
    Zs = np.asarray(sag_fn(Xs, Ys), dtype=float)

    # separable LSQ: C = pinv(Bu) Z pinv(Bv)^T
    Pz = np.linalg.pinv(Bu) @ Zs @ np.linalg.pinv(Bv).T
    Px = x0 + gu[:, None] * (x1 - x0) + 0.0 * gv[None, :]
    Py = y0 + 0.0 * gu[:, None] + gv[None, :] * (y1 - y0)
    W = np.ones((nu, nv))
    return U, V, W, Px, Py, Pz
