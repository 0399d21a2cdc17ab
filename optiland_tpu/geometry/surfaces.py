"""Surface geometry kernels: sag, gradient, normal, and ray intersection.

TPU-first re-design of the reference geometry zoo
(`optiland/geometries/*.py`, SURVEY.md §2.3). In the reference every geometry
is a class with `sag/surface_normal/distance` methods; here a geometry is a
static integer code plus a `(cv, k, coeffs)` parameter triple, and all
kernels are pure functions. Because the code is static per surface, the
unrolled trace calls the exact sag formula with zero runtime dispatch, and
XLA fuses the whole intersect+interact chain.

Key differences from the reference (deliberate, TPU-motivated):
  - curvature `cv = 1/R` parameterization: planes are the smooth limit
    `cv -> 0` of the same closed-form conic intersection (no infinities; a
    `reciprocal_radius` optimization variable is the natural chart),
  - Newton-Raphson intersection for aspheres runs a *fixed* iteration count
    (static unrolled loop, quadratic convergence) instead of the reference's
    tolerance loop (`geometries/newton_raphson.py:119-168`), keeping the op
    jit-compatible with static shapes,
  - ray misses are masked (valid=False) instead of NaN-poisoned.

Sag conventions match the reference exactly:
  - conic: z = cv r^2 / (1 + sqrt(1 - (1+k) cv^2 r^2))  (`standard.py:81`)
  - even asphere: + sum_i C_i r^(2i), i = 1..  (`even_asphere.py:54`)
  - odd asphere:  + sum_i C_i r^i,    i = 1..  (`odd_asphere.py`)
  - polynomial freeform: + sum_ij C_ij x^i y^j (`polynomial.py:33`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GEOM_PLANE = 0
GEOM_CONIC = 1
GEOM_EVEN_ASPHERE = 2
GEOM_ODD_ASPHERE = 3
GEOM_POLYNOMIAL_XY = 4
GEOM_BICONIC = 5
GEOM_TOROIDAL = 6
GEOM_CHEBYSHEV = 7
GEOM_ZERNIKE = 8
GEOM_FORBES_QBFS = 9
GEOM_FORBES_Q2D = 10
GEOM_GRID_SAG = 11
GEOM_NURBS = 12

# Geometry codes that are exactly a conic (closed-form intersection, no
# Newton refinement needed).
_CLOSED_FORM = (GEOM_PLANE, GEOM_CONIC)

_EPS = 1e-14

# Coefficient-vector layouts for the non-conic geometries (all packed into
# the per-surface padded `coeffs` row; `aux` carries static ints):
#   BICONIC:   coeffs = [cvy, ky];  (cv, k) are the x-profile
#   TOROIDAL:  (cv, k) = Y-Z curve; coeffs = [cv_rot, alpha_1..alpha_n]
#              (alpha_i multiplies y^(2(i+1)), reference `toroidal.py:110-122`)
#   CHEBYSHEV: coeffs = [norm_x, norm_y, C_00..C_ij row-major]; aux = (rows, cols)
#   ZERNIKE:   coeffs = [norm_radius, c_0..c_n]; aux = (type_code,) with
#              0=fringe, 1=noll, 2=standard (reference `zernike.py:44-51`)
#   FORBES_QBFS: coeffs = [norm_radius, a_0..a_N]; aux = ()
#   FORBES_Q2D:  coeffs = [norm_radius, c_0..]; aux = ((n, m_signed), ...)
#                with m_signed > 0 = cos ('a') term, < 0 = sin ('b') term
#   GRID_SAG:  coeffs = x_grid(nx) ++ y_grid(ny) ++ z(ny*nx row-major);
#              aux = (nx, ny)
#   NURBS:     coeffs = U(nu+p+1) ++ V(nv+q+1) ++ W(nu*nv) ++ Px ++ Py ++ Pz
#              (each nu*nv, u-major);
#              aux = (p, q, nu, nv, x0, x1, y0, y1) — degrees/counts plus the
#              static patch footprint box used for Newton initial guesses
ZERNIKE_TYPE_CODES = {"fringe": 0, "noll": 1, "standard": 2}
_ZERNIKE_TYPES = {v: k for k, v in ZERNIKE_TYPE_CODES.items()}


def _conic_sag(x, y, cv, k):
    r2 = x * x + y * y
    den = 1.0 + jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * cv * cv * r2, _EPS))
    return cv * r2 / den


def _conic_grad(x, y, cv, k):
    """(d sag/dx, d sag/dy) for the conic; analytic form as in the reference
    (`standard.py:150-176`), written in curvature form."""
    r2 = x * x + y * y
    root = jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * cv * cv * r2, _EPS))
    dfdr2 = cv / (1.0 + root)  # d sag / d(r^2) * ... simplified below
    # sag = cv r2 / (1 + root); d sag/dx = x * cv / root * ... use the
    # standard result: d sag/dx = cv x / sqrt(1 - (1+k) cv^2 r^2)
    del dfdr2
    return cv * x / root, cv * y / root


def _even_asphere_terms(x, y, coeffs, n_coeffs):
    r2 = x * x + y * y
    s = 0.0
    rp = r2
    for i in range(n_coeffs):
        s = s + coeffs[i] * rp
        rp = rp * r2
    return s


def _even_asphere_grad_terms(x, y, coeffs, n_coeffs):
    r2 = x * x + y * y
    # d/dx sum C_i r^(2i) = x * sum 2 i C_i r^(2(i-1))
    g = 0.0
    rp = jnp.ones_like(r2)
    for i in range(n_coeffs):
        g = g + 2.0 * (i + 1) * coeffs[i] * rp
        rp = rp * r2
    return x * g, y * g


def _odd_asphere_terms(x, y, coeffs, n_coeffs):
    r = jnp.sqrt(x * x + y * y)
    s = 0.0
    rp = r
    for i in range(n_coeffs):
        s = s + coeffs[i] * rp
        rp = rp * r
    return s


def _odd_asphere_grad_terms(x, y, coeffs, n_coeffs):
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, _EPS))
    g = 0.0
    rp = jnp.ones_like(r)
    # d/dr sum C_i r^i = sum i C_i r^(i-1); d r/dx = x / r
    for i in range(n_coeffs):
        g = g + (i + 1) * coeffs[i] * rp
        rp = rp * r
    return x / r * g, y / r * g


def _poly_xy_terms(x, y, coeffs, n_coeffs, grad: bool):
    """Freeform sum C_ij x^i y^j with coefficients flattened row-major over a
    triangular (i+j <= order) layout matching the reference PolynomialGeometry."""
    # coeffs laid out as a square (order+1)^2 grid flattened; n_coeffs = len
    order = int(round(n_coeffs**0.5)) - 1
    s = 0.0
    gx = 0.0
    gy = 0.0
    for i in range(order + 1):
        for j in range(order + 1):
            cij = coeffs[i * (order + 1) + j]
            s = s + cij * x**i * y**j
            if grad:
                if i > 0:
                    gx = gx + cij * i * x ** (i - 1) * y**j
                if j > 0:
                    gy = gy + cij * j * x**i * y ** (j - 1)
    if grad:
        return s, gx, gy
    return s


def _biconic_sag(x, y, cv, k, coeffs):
    zx = _conic_1d(x, cv, k)
    zy = _conic_1d(y, coeffs[0], coeffs[1])
    return zx + zy


def _conic_1d(t, c, k):
    """1-D conic profile c t^2 / (1 + sqrt(1 - (1+k) c^2 t^2))."""
    t2 = t * t
    den = 1.0 + jnp.sqrt(jnp.maximum(1.0 - (1.0 + k) * c * c * t2, _EPS))
    return c * t2 / den


def _toroidal_sag(x, y, cv, k, coeffs, n_coeffs):
    """z = R - sqrt((R - z_y)^2 - x^2), rationalized to curvature form
    (regular at cv_rot = 0): z = (2 z_y - c z_y^2 + c x^2) / (1 + sqrt(w)),
    w = (1 - c z_y)^2 - c^2 x^2 (reference `toroidal.py:162-200`)."""
    z_y = _conic_1d(y, cv, k)
    y2 = y * y
    yp = y2
    for i in range(1, n_coeffs):
        z_y = z_y + coeffs[i] * yp
        yp = yp * y2
    c = coeffs[0]
    w = (1.0 - c * z_y) ** 2 - c * c * x * x
    w = jnp.maximum(w, _EPS)
    return (2.0 * z_y - c * z_y * z_y + c * x * x) / (1.0 + jnp.sqrt(w))


def _cheb_T(order: int, t):
    """Chebyshev T_0..T_order values at t via the recurrence (unrolled)."""
    Ts = [jnp.ones_like(t), t]
    for _ in range(2, order + 1):
        Ts.append(2.0 * t * Ts[-1] - Ts[-2])
    return Ts[: order + 1]


def _chebyshev_sag(x, y, cv, k, coeffs, rows: int, cols: int):
    nx = coeffs[0]
    ny = coeffs[1]
    xn = x / nx
    yn = y / ny
    z = _conic_sag(x, y, cv, k)
    Tx = _cheb_T(rows - 1, xn)
    Ty = _cheb_T(cols - 1, yn)
    for i in range(rows):
        for j in range(cols):
            z = z + coeffs[2 + i * cols + j] * Tx[i] * Ty[j]
    return z


def _zernike_sag(x, y, cv, k, coeffs, n_coeffs: int, type_code: int):
    from optiland_tpu import zernike as _z

    norm_radius = coeffs[0]
    xn = x / norm_radius
    yn = y / norm_radius
    z = _conic_sag(x, y, cv, k)
    zc = jnp.stack([coeffs[1 + i] for i in range(n_coeffs - 1)])
    # Cartesian polynomial evaluation: smooth at the vertex, unlike the
    # (rho, phi) form whose arctan2 JVP is singular at the origin
    return z + _z.evaluate_xy(_ZERNIKE_TYPES[type_code], zc, xn, yn)


def _forbes_phi(r2, cv, k):
    """Forbes conic correction factor sqrt((1-kc^2r^2)/(1-(1+k)c^2r^2))
    projecting the normal departure onto the sag axis (reference
    `forbes/geometry.py:151-183`)."""
    c2r2 = cv * cv * r2
    num = jnp.maximum(1.0 - k * c2r2, 1e-12)
    den = jnp.maximum(1.0 - (1.0 + k) * c2r2, 1e-12)
    return jnp.sqrt(num / den)


def _forbes_qbfs_sag(x, y, cv, k, coeffs, n_coeffs):
    """Forbes Q (slope-orthogonal, 'Qbfs') sag (reference
    `forbes/geometry.py:268-289`)."""
    from optiland_tpu.geometry import forbes as _fb

    r2 = x * x + y * y
    zb = _conic_sag(x, y, cv, k)
    if n_coeffs <= 1:
        return zb
    nr = coeffs[0]
    usq = r2 / (nr * nr)
    a = [coeffs[1 + i] for i in range(n_coeffs - 1)]
    S = usq * (1.0 - usq) * _forbes_phi(r2, cv, k) * _fb.qbfs_sum(a, usq)
    return zb + jnp.where(usq > 1.0, 0.0, S)


def _forbes_q2d_sag(x, y, cv, k, coeffs, n_coeffs, nm_pairs):
    """Forbes Q2D freeform sag (reference `forbes/geometry.py:540-570`).

    The u^m cos(m theta) / sin(m theta) harmonics are evaluated as Cartesian
    polynomials C_m + i S_m = ((x + i y)/r_norm)^m via the real recurrence —
    smooth at the vertex (no arctan2), so `jax.jvp` gradients are clean.
    """
    from optiland_tpu.geometry import forbes as _fb

    r2 = x * x + y * y
    zb = _conic_sag(x, y, cv, k)
    if n_coeffs <= 1:
        return zb
    nr = coeffs[0]
    xn = x / nr
    yn = y / nr
    usq = r2 / (nr * nr)

    cm0: dict = {}
    a_by_m: dict = {}
    b_by_m: dict = {}
    for i, (n, ms) in enumerate(nm_pairs):
        c = coeffs[1 + i]
        if ms == 0:
            cm0[n] = c
        elif ms > 0:
            a_by_m.setdefault(ms, {})[n] = c
        else:
            b_by_m.setdefault(-ms, {})[n] = c

    total = jnp.zeros_like(x)
    if cm0:
        n_top = max(cm0)
        cs = [cm0.get(n, 0.0) for n in range(n_top + 1)]
        total = total + usq * (1.0 - usq) * _fb.qbfs_sum(cs, usq)

    max_m = max(list(a_by_m) + list(b_by_m), default=0)
    Cm = jnp.ones_like(x)
    Sm = jnp.zeros_like(x)
    for m in range(1, max_m + 1):
        Cm, Sm = Cm * xn - Sm * yn, Sm * xn + Cm * yn
        term = jnp.zeros_like(x)
        if m in a_by_m:
            n_top = max(a_by_m[m])
            cs = [a_by_m[m].get(n, 0.0) for n in range(n_top + 1)]
            term = term + Cm * _fb.q2d_sum(cs, m, usq)
        if m in b_by_m:
            n_top = max(b_by_m[m])
            cs = [b_by_m[m].get(n, 0.0) for n in range(n_top + 1)]
            term = term + Sm * _fb.q2d_sum(cs, m, usq)
        total = total + term

    S = _forbes_phi(r2, cv, k) * total
    return zb + jnp.where(usq > 1.0, 0.0, S)


def _grid_slices(coeffs, nx: int, ny: int):
    xg = coeffs[0:nx]
    yg = coeffs[nx: nx + ny]
    zg = coeffs[nx + ny: nx + ny + nx * ny].reshape(ny, nx)
    return xg, yg, zg


def _grid_interp(x, y, coeffs, nx: int, ny: int):
    """Bilinear interpolation on the tabulated sag grid + cell derivatives +
    out-of-bounds mask (reference `grid_sag.py:62-104`; clamped instead of
    NaN-poisoned — the mask feeds the intersect validity)."""
    xg, yg, zg = _grid_slices(coeffs, nx, ny)
    i = jnp.clip(jnp.searchsorted(xg, x, side="right") - 1, 0, nx - 2)
    j = jnp.clip(jnp.searchsorted(yg, y, side="right") - 1, 0, ny - 2)
    x1, x2 = xg[i], xg[i + 1]
    y1, y2 = yg[j], yg[j + 1]
    z11, z12 = zg[j, i], zg[j, i + 1]
    z21, z22 = zg[j + 1, i], zg[j + 1, i + 1]
    dx = x2 - x1
    dy = y2 - y1
    tx = (x - x1) / dx
    ty = (y - y1) / dy
    z = (z11 * (1 - tx) + z12 * tx) * (1 - ty) + (z21 * (1 - tx) + z22 * tx) * ty
    gx = ((z12 - z11) * (1 - ty) + (z22 - z21) * ty) / dx
    gy = ((z21 - z11) * (1 - tx) + (z22 - z12) * tx) / dy
    oob = (x < xg[0]) | (x > xg[-1]) | (y < yg[0]) | (y > yg[-1])
    return z, gx, gy, oob


def _nurbs_slices(coeffs, aux):
    p, q, nu, nv = aux
    lu = nu + p + 1
    lv = nv + q + 1
    o = 0
    U = coeffs[o: o + lu]; o += lu  # noqa: E702
    V = coeffs[o: o + lv]; o += lv  # noqa: E702
    n = nu * nv
    W = coeffs[o: o + n]; o += n  # noqa: E702
    Px = coeffs[o: o + n]; o += n  # noqa: E702
    Py = coeffs[o: o + n]; o += n  # noqa: E702
    Pz = coeffs[o: o + n]; o += n  # noqa: E702
    return U, V, W, Px, Py, Pz


def sag(code: int, n_coeffs: int, x, y, cv, k, coeffs, aux: tuple = ()):
    """Surface sag z(x, y). `code`, `n_coeffs` and `aux` are static."""
    base = _conic_sag(x, y, cv, k)
    if code in (GEOM_PLANE,):
        return jnp.zeros_like(x + y)
    if code == GEOM_CONIC:
        return base
    if code == GEOM_EVEN_ASPHERE:
        return base + _even_asphere_terms(x, y, coeffs, n_coeffs)
    if code == GEOM_ODD_ASPHERE:
        return base + _odd_asphere_terms(x, y, coeffs, n_coeffs)
    if code == GEOM_POLYNOMIAL_XY:
        return base + _poly_xy_terms(x, y, coeffs, n_coeffs, grad=False)
    if code == GEOM_BICONIC:
        return _biconic_sag(x, y, cv, k, coeffs)
    if code == GEOM_TOROIDAL:
        return _toroidal_sag(x, y, cv, k, coeffs, n_coeffs)
    if code == GEOM_CHEBYSHEV:
        return _chebyshev_sag(x, y, cv, k, coeffs, aux[0], aux[1])
    if code == GEOM_ZERNIKE:
        return _zernike_sag(x, y, cv, k, coeffs, n_coeffs, aux[0])
    if code == GEOM_FORBES_QBFS:
        return _forbes_qbfs_sag(x, y, cv, k, coeffs, n_coeffs)
    if code == GEOM_FORBES_Q2D:
        return _forbes_q2d_sag(x, y, cv, k, coeffs, n_coeffs, aux)
    if code == GEOM_GRID_SAG:
        z, _, _, _ = _grid_interp(x, y, coeffs, aux[0], aux[1])
        return z
    if code == GEOM_NURBS:
        from optiland_tpu.geometry import nurbs as _nb

        U, V, W, Px, Py, Pz = _nurbs_slices(coeffs, aux[:4])
        p, q, nu, nv = aux[:4]
        z, _, _ = _nb.sag_and_grad_xy(U, V, W, Px, Py, Pz, p, q, nu, nv,
                                      aux[4:8], x, y)
        return z
    raise ValueError(f"Unknown geometry code {code}")


def sag_and_grad(code: int, n_coeffs: int, x, y, cv, k, coeffs, aux: tuple = ()):
    """Return (sag, d sag/dx, d sag/dy) — one fused evaluation for Newton
    steps and surface normals.

    Conic/asphere/poly families use hand-written analytic gradients (fewest
    FLOPs on the hot path); the freeform families get exact gradients via
    two forward-mode JVPs of their sag — no hand-derivation, still one fused
    XLA graph.
    """
    if code == GEOM_PLANE:
        z = jnp.zeros_like(x + y)
        return z, z, z
    if code in (GEOM_CONIC,) or (n_coeffs == 0 and code in
                                 (GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE,
                                  GEOM_POLYNOMIAL_XY)):
        z = _conic_sag(x, y, cv, k)
        gx, gy = _conic_grad(x, y, cv, k)
        return z, gx, gy
    if code == GEOM_EVEN_ASPHERE:
        z = _conic_sag(x, y, cv, k)
        gx, gy = _conic_grad(x, y, cv, k)
        tz = _even_asphere_terms(x, y, coeffs, n_coeffs)
        tx, ty = _even_asphere_grad_terms(x, y, coeffs, n_coeffs)
        return z + tz, gx + tx, gy + ty
    if code == GEOM_ODD_ASPHERE:
        z = _conic_sag(x, y, cv, k)
        gx, gy = _conic_grad(x, y, cv, k)
        tz = _odd_asphere_terms(x, y, coeffs, n_coeffs)
        tx, ty = _odd_asphere_grad_terms(x, y, coeffs, n_coeffs)
        return z + tz, gx + tx, gy + ty
    if code == GEOM_POLYNOMIAL_XY:
        z = _conic_sag(x, y, cv, k)
        gx, gy = _conic_grad(x, y, cv, k)
        tz, tx, ty = _poly_xy_terms(x, y, coeffs, n_coeffs, grad=True)
        return z + tz, gx + tx, gy + ty
    if code == GEOM_GRID_SAG:
        z, gx, gy, _ = _grid_interp(x, y, coeffs, aux[0], aux[1])
        return z, gx, gy
    if code == GEOM_NURBS:
        from optiland_tpu.geometry import nurbs as _nb

        U, V, W, Px, Py, Pz = _nurbs_slices(coeffs, aux[:4])
        p, q, nu, nv = aux[:4]
        return _nb.sag_and_grad_xy(U, V, W, Px, Py, Pz, p, q, nu, nv,
                                   aux[4:8], x, y)
    if code in (GEOM_BICONIC, GEOM_TOROIDAL, GEOM_CHEBYSHEV, GEOM_ZERNIKE,
                GEOM_FORBES_QBFS, GEOM_FORBES_Q2D):
        fn = lambda xx, yy: sag(code, n_coeffs, xx, yy, cv, k, coeffs, aux)  # noqa: E731
        z, gx = jax.jvp(lambda xx: fn(xx, y), (x,), (jnp.ones_like(x),))
        _, gy = jax.jvp(lambda yy: fn(x, yy), (y,), (jnp.ones_like(y),))
        return z, gx, gy
    raise ValueError(f"Unknown geometry code {code}")


def surface_normal(code: int, n_coeffs: int, x, y, cv, k, coeffs,
                   aux: tuple = ()):
    """Unit surface normal at (x, y) on the surface, oriented with nz < 0
    (the reference convention, `standard.py:150-176`: grad(sag - z))."""
    _, gx, gy = sag_and_grad(code, n_coeffs, x, y, cv, k, coeffs, aux)
    mag = jnp.sqrt(gx * gx + gy * gy + 1.0)
    return gx / mag, gy / mag, -1.0 / mag


def _conic_intersect(x, y, z, L, M, N, cv, k):
    """Closed-form ray/conic intersection in curvature form.

    Same quadratic as the reference (`standard.py:97-148`) scaled by 1/R, so
    the roots — and the vertex-nearest root selection — are identical, but
    cv = 0 (plane) is the regular limit handled by the linear fallback.
    Returns (t, valid).
    """
    kk = 1.0 + k
    A = cv * (L * L + M * M + kk * N * N)
    B = 2.0 * (cv * (L * x + M * y + kk * N * z) - N)
    C = cv * (x * x + y * y + kk * z * z) - 2.0 * z

    disc = B * B - 4.0 * A * C
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))

    A_safe = jnp.where(jnp.abs(A) > _EPS, A, 1.0)
    t1 = (-B + sq) / (2.0 * A_safe)
    t2 = (-B - sq) / (2.0 * A_safe)
    # pick the intersection closest to the vertex plane z = 0
    z1 = z + t1 * N
    z2 = z + t2 * N
    t_quad = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)

    # linear fallback for A ~ 0 (plane, or ray parallel to conic axis family)
    B_safe = jnp.where(jnp.abs(B) > _EPS, B, _EPS)
    t_lin = -C / B_safe
    t = jnp.where(jnp.abs(A) > _EPS, t_quad, t_lin)
    valid = jnp.where(jnp.abs(A) > _EPS, valid, True)
    return t, valid


def intersect(code: int, n_coeffs: int, x, y, z, L, M, N, cv, k, coeffs,
              newton_iters: int = 16, aux: tuple = ()):
    """Distance t from ray origin to the surface (local frame).

    Closed form for plane/conic; conic initial guess + fixed-count Newton
    refinement on f(t) = sag(x+tL, y+tM) - (z+tN) for every other geometry
    (reference `newton_raphson.py:119-168`, re-cast as a static unrolled
    loop). Returns (t, valid).
    """
    if code == GEOM_NURBS:
        from optiland_tpu.geometry import nurbs as _nb

        U, V, W, Px, Py, Pz = _nurbs_slices(coeffs, aux[:4])
        p, q, nu, nv = aux[:4]
        return _nb.intersect_two_plane(U, V, W, Px, Py, Pz, p, q, nu, nv,
                                       aux[4:8], x, y, z, L, M, N,
                                       iters=newton_iters)

    t, valid = _conic_intersect(x, y, z, L, M, N, cv, k)
    if code in _CLOSED_FORM or (
        n_coeffs == 0 and code in (GEOM_EVEN_ASPHERE, GEOM_ODD_ASPHERE,
                                   GEOM_POLYNOMIAL_XY)
    ):
        return t, valid

    for _ in range(newton_iters):
        xt = x + t * L
        yt = y + t * M
        zt = z + t * N
        s, gx, gy = sag_and_grad(code, n_coeffs, xt, yt, cv, k, coeffs, aux)
        f = s - zt
        fp = gx * L + gy * M - N
        fp = jnp.where(jnp.abs(fp) > _EPS, fp, jnp.sign(fp) * _EPS + (fp == 0) * _EPS)
        t = t - f / fp

    if code == GEOM_GRID_SAG:
        # rays landing outside the tabulated grid are invalid (the reference
        # NaN-poisons them, `grid_sag.py:134-145`; we mask instead)
        _, _, _, oob = _grid_interp(x + t * L, y + t * M, coeffs,
                                    aux[0], aux[1])
        valid = valid & ~oob
    return t, valid


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def intersect_implicit(code: int, n_coeffs: int, newton_iters: int,
                       aux: tuple, cv, k, coeffs, x, y, z, L, M, N):
    """Newton intersection whose VJP differentiates through the *converged
    root* via the implicit function theorem instead of unrolling the
    iteration — the backward pass costs one sag_and_grad + one VJP of sag
    instead of `newton_iters` chained iterations, and is exact at
    convergence (SURVEY.md §7 "hard parts").

    t*(p) solves F(t, p) = sag(x + tL, y + tM; p) - (z + tN) = 0
    => dt/dp = -(dF/dp) / (dF/dt).
    """
    t, _ = intersect(code, n_coeffs, x, y, z, L, M, N, cv, k, coeffs,
                     newton_iters, aux)
    return t


def _implicit_fwd(code, n_coeffs, newton_iters, aux, cv, k, coeffs,
                  x, y, z, L, M, N):
    t, _ = intersect(code, n_coeffs, x, y, z, L, M, N,
                     jax.lax.stop_gradient(cv), jax.lax.stop_gradient(k),
                     jax.lax.stop_gradient(coeffs), newton_iters, aux)
    t = jax.lax.stop_gradient(t)
    return t, (cv, k, coeffs, x, y, z, L, M, N, t)


def _implicit_bwd(code, n_coeffs, newton_iters, aux, res, g):
    cv, k, coeffs, x, y, z, L, M, N, t = res

    def F(cv, k, coeffs, x, y, z):
        return sag(code, n_coeffs, x + t * L, y + t * M, cv, k, coeffs,
                   aux) - (z + t * N)

    _, gx, gy = sag_and_grad(code, n_coeffs, x + t * L, y + t * M, cv, k,
                             coeffs, aux)
    ft = gx * L + gy * M - N
    ft = jnp.where(jnp.abs(ft) > _EPS, ft, _EPS)
    lam = -g / ft
    _, vjp = jax.vjp(F, cv, k, coeffs, x, y, z)
    d_cv, d_k, d_coeffs, d_x, d_y, d_z = vjp(lam)
    # dF/dL = gx*t, dF/dM = gy*t, dF/dN = -t (direction deps of the root)
    d_L = lam * gx * t
    d_M = lam * gy * t
    d_N = lam * (-t)
    return d_cv, d_k, d_coeffs, d_x, d_y, d_z, d_L, d_M, d_N


intersect_implicit.defvjp(_implicit_fwd, _implicit_bwd)
