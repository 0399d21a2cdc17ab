"""Zernike golden suite — the port of the reference's 830-LoC
`tests/test_zernike.py` tiers (VERDICT r4 item 3): closed-form term goldens,
orthogonality, norm constants, index numbering for all three conventions,
derivative parity via autodiff, LSQ fit recovery, and parity vs the mounted
reference classes (`optiland/zernike/{fringe,noll,standard}.py`)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optiland_tpu import zernike as Z

CONVENTIONS = ("fringe", "noll", "standard")


def _eval_one(ztype, n, m, r, phi):
    """Evaluate the single (n, m) term of a convention at (r, phi)."""
    num_terms = 64
    idx = Z.indices(ztype, num_terms)
    t = idx.index((n, m))
    coeffs = np.zeros(num_terms)
    coeffs[t] = 1.0
    return np.asarray(Z.evaluate(ztype, jnp.asarray(coeffs),
                                 jnp.asarray(r), jnp.asarray(phi)))


# ---------------------------------------------------------------------------
# closed-form golden values (hand-derived from the standard Zernike tables)
# ---------------------------------------------------------------------------
R = np.array([0.0, 0.3, 0.5, 0.7, 1.0])
PHI = np.array([0.0, 0.7, 1.9, 3.5, 5.1])


@pytest.mark.parametrize("n,m,expr", [
    (0, 0, lambda r, p: np.ones_like(r)),                       # piston
    (1, 1, lambda r, p: r * np.cos(p)),                         # x tilt
    (1, -1, lambda r, p: r * np.sin(p)),                        # y tilt
    (2, 0, lambda r, p: 2 * r**2 - 1),                          # defocus
    (2, 2, lambda r, p: r**2 * np.cos(2 * p)),                  # astig 0
    (2, -2, lambda r, p: r**2 * np.sin(2 * p)),                 # astig 45
    (3, 1, lambda r, p: (3 * r**3 - 2 * r) * np.cos(p)),        # coma x
    (3, -1, lambda r, p: (3 * r**3 - 2 * r) * np.sin(p)),       # coma y
    (3, 3, lambda r, p: r**3 * np.cos(3 * p)),                  # trefoil
    (4, 0, lambda r, p: 6 * r**4 - 6 * r**2 + 1),               # spherical
    (4, 2, lambda r, p: (4 * r**4 - 3 * r**2) * np.cos(2 * p)),
    (5, 1, lambda r, p: (10 * r**5 - 12 * r**3 + 3 * r) * np.cos(p)),
    (6, 0, lambda r, p: 20 * r**6 - 30 * r**4 + 12 * r**2 - 1),
])
def test_fringe_term_golden(n, m, expr):
    # fringe terms are unnormalized: the raw R_n^m * cos/sin
    got = _eval_one("fringe", n, m, R, PHI)
    np.testing.assert_allclose(got, expr(R, PHI), rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("ztype", ("noll", "standard"))
@pytest.mark.parametrize("n,m", [(1, 1), (2, 0), (2, -2), (3, 1), (4, 0)])
def test_normalized_term_golden(ztype, n, m):
    # noll/standard terms carry sqrt(2(n+1)) (m!=0) or sqrt(n+1) (m=0)
    norm = math.sqrt(2 * (n + 1)) if m != 0 else math.sqrt(n + 1)
    got = _eval_one(ztype, n, m, R, PHI)
    raw = _eval_one("fringe", n, m, R, PHI) if (n, m) in Z.indices(
        "fringe", 64) else None
    assert raw is not None
    np.testing.assert_allclose(got, norm * raw, rtol=1e-12, atol=1e-13)


def test_radial_term_is_bounded_on_disk():
    # |R_n^m(r)| <= 1 on [0, 1] for all terms (classic Zernike property)
    r = np.linspace(0, 1, 501)
    for n, m in Z.indices("standard", 36):
        vals = Z._radial_term(n, m, r)
        assert np.max(np.abs(np.asarray(vals))) <= 1.0 + 1e-9, (n, m)


@pytest.mark.parametrize("ztype", ("noll", "standard"))
def test_orthonormality(ztype):
    """∫∫ Z_i Z_j r dr dphi / pi == delta_ij for the normalized conventions
    (the defining property; checked by Gauss-Legendre quadrature)."""
    # nodes: Gauss-Legendre in r^2 (exact for polynomials) x uniform in phi
    nr, nphi = 48, 128
    u, wu = np.polynomial.legendre.leggauss(nr)
    u = 0.5 * (u + 1.0)          # u = r^2 in [0, 1]
    wu = 0.5 * wu
    r = np.sqrt(u)
    phi = np.arange(nphi) * (2 * np.pi / nphi)
    Rg, Pg = np.meshgrid(r, phi, indexing="ij")
    A = np.asarray(Z.design_matrix(ztype, 21, jnp.asarray(Rg.ravel()),
                                   jnp.asarray(Pg.ravel())))
    A = A.reshape(nr, nphi, -1)
    # inner products: r dr = du/2, so (1/pi) * (1/2) sum_r wu * sum_phi dphi
    G = np.einsum("rpi,rpj,r->ij", A, A, wu) * (2 * np.pi / nphi) / (2 * np.pi)
    np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=5e-9)


def test_fringe_numbering_golden():
    """First 16 fringe (n, m) pairs in the standard fringe ordering (as
    published in OpticStudio/Wyant tables)."""
    want = [(0, 0), (1, 1), (1, -1), (2, 0), (2, 2), (2, -2), (3, 1),
            (3, -1), (4, 0), (3, 3), (3, -3), (4, 2), (4, -2), (5, 1),
            (5, -1), (6, 0)]
    assert list(Z.indices("fringe", 16)) == want


def test_noll_numbering_golden():
    """Noll 1976 table: j -> (n, m) for the first 15 modes."""
    want = [(0, 0), (1, 1), (1, -1), (2, 0), (2, -2), (2, 2), (3, -1),
            (3, 1), (3, -3), (3, 3), (4, 0), (4, 2), (4, -2), (4, 4),
            (4, -4)]
    assert list(Z.indices("noll", 15)) == want


def test_standard_numbering_golden():
    """ANSI/OSA standard: j = (n(n+2) + m) / 2."""
    want = [(0, 0), (1, -1), (1, 1), (2, -2), (2, 0), (2, 2), (3, -3),
            (3, -1), (3, 1), (3, 3)]
    assert list(Z.indices("standard", 10)) == want


@pytest.mark.parametrize("ztype", CONVENTIONS)
def test_evaluate_xy_matches_polar(ztype):
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.7, 0.7, 64)
    y = rng.uniform(-0.7, 0.7, 64)
    c = rng.normal(size=28)
    r = np.hypot(x, y)
    phi = np.arctan2(y, x)
    a = np.asarray(Z.evaluate(ztype, jnp.asarray(c), jnp.asarray(r),
                              jnp.asarray(phi)))
    b = np.asarray(Z.evaluate_xy(ztype, jnp.asarray(c), jnp.asarray(x),
                                 jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


def test_evaluate_xy_smooth_at_origin():
    # the Cartesian form must have finite gradients exactly on-axis
    c = jnp.asarray(np.linspace(0.1, 0.5, 10))
    g = jax.grad(lambda x: Z.evaluate_xy("fringe", c, x, 0.0))(0.0)
    assert np.isfinite(float(g))


@pytest.mark.parametrize("ztype", CONVENTIONS)
def test_fit_recovers_known_coeffs(ztype):
    rng = np.random.default_rng(11)
    n = 400
    r = np.sqrt(rng.uniform(0, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    true = rng.normal(size=15)
    z = np.asarray(Z.evaluate(ztype, jnp.asarray(true), jnp.asarray(r),
                              jnp.asarray(phi)))
    got = np.asarray(Z.fit(ztype, 15, jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(z)))
    np.testing.assert_allclose(got, true, rtol=1e-6, atol=1e-8)


def test_fit_is_differentiable():
    rng = np.random.default_rng(5)
    n = 100
    x = rng.uniform(-0.7, 0.7, n)
    y = rng.uniform(-0.7, 0.7, n)

    def loss(z):
        c = Z.fit("fringe", 6, jnp.asarray(x), jnp.asarray(y), z)
        return jnp.sum(c ** 2)

    z0 = jnp.asarray(rng.normal(size=n))
    g = jax.grad(loss)(z0)
    assert np.all(np.isfinite(np.asarray(g)))
    # numerical check on one sample
    eps = 1e-5
    dz = np.zeros(n)
    dz[7] = eps
    fd = (float(loss(z0 + jnp.asarray(dz))) - float(loss(z0 - jnp.asarray(dz)))) / (2 * eps)
    np.testing.assert_allclose(float(g[7]), fd, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# parity vs the mounted reference
# ---------------------------------------------------------------------------
_REF_CLASSES = {"fringe": "ZernikeFringe", "noll": "ZernikeNoll",
                "standard": "ZernikeStandard"}


@pytest.mark.parametrize("ztype", CONVENTIONS)
def test_poly_parity_vs_reference(ztype, reference):
    import optiland.zernike as rz

    rng = np.random.default_rng(7)
    coeffs = rng.normal(size=36)
    ref = getattr(rz, _REF_CLASSES[ztype])(coeffs=list(coeffs))
    r = np.sqrt(rng.uniform(0, 1, 50))
    phi = rng.uniform(0, 2 * np.pi, 50)
    want = np.asarray(ref.poly(r, phi))
    got = np.asarray(Z.evaluate(ztype, jnp.asarray(coeffs), jnp.asarray(r),
                                jnp.asarray(phi)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("ztype", CONVENTIONS)
@pytest.mark.parametrize("term", [1, 3, 4, 7, 11])
def test_term_parity_vs_reference(ztype, term, reference):
    import optiland.zernike as rz

    rng = np.random.default_rng(13)
    coeffs = np.zeros(36)
    coeffs[term] = 1.0
    ref = getattr(rz, _REF_CLASSES[ztype])(coeffs=list(coeffs))
    r = np.sqrt(rng.uniform(0, 1, 20))
    phi = rng.uniform(0, 2 * np.pi, 20)
    want = np.asarray(ref.poly(r, phi))
    got = np.asarray(Z.evaluate(ztype, jnp.asarray(coeffs), jnp.asarray(r),
                                jnp.asarray(phi)))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("ztype", CONVENTIONS)
def test_derivative_parity_vs_reference(ztype, reference):
    """d/dr and d/dphi of each term via jax.grad vs the reference's
    closed-form `get_derivative` (`zernike/base.py:104-137`)."""
    import optiland.zernike as rz

    ref = getattr(rz, _REF_CLASSES[ztype])(coeffs=list(np.zeros(16)))
    r0, phi0 = 0.613, 1.234
    for t, (n, m) in enumerate(Z.indices(ztype, 16)):
        coeffs = np.zeros(16)
        coeffs[t] = 1.0
        cj = jnp.asarray(coeffs)
        dr = jax.grad(lambda r: Z.evaluate(ztype, cj, r, phi0))(r0)
        dphi = jax.grad(lambda p: Z.evaluate(ztype, cj, r0, p))(phi0)
        # the reference's get_derivative omits the norm constant (it
        # differentiates radial*azimuthal only, `zernike/base.py:122-137`)
        norm = Z._norm_constant(ztype, n, m)
        want_dr, want_dphi = ref.get_derivative(n, m, np.asarray([r0]),
                                                np.asarray([phi0]))
        np.testing.assert_allclose(
            float(dr), norm * float(np.ravel(np.asarray(want_dr))[0]),
            rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            float(dphi), norm * float(np.ravel(np.asarray(want_dphi))[0]),
            rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("ztype", CONVENTIONS)
def test_fit_parity_vs_reference(ztype, reference):
    from optiland.zernike import ZernikeFit

    rng = np.random.default_rng(17)
    n = 300
    r = np.sqrt(rng.uniform(0, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    z = 0.3 * (2 * r**2 - 1) + 0.1 * r * np.cos(phi) + 0.05 * rng.normal(size=n)
    ref = ZernikeFit(x, y, z, zernike_type=ztype, num_terms=15)
    got = np.asarray(Z.fit(ztype, 15, jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(z)))
    np.testing.assert_allclose(got, np.asarray(ref.coeffs), rtol=1e-6,
                               atol=1e-8)
