"""NURBS basis + Forbes Q-polynomial primitive goldens (the reference's
`tests/test_geometries_extended.py` / `nurbs_basis_functions` tier):
partition of unity, local support, derivative consistency, de Boor vs
direct evaluation, fit round-trips, and Forbes Qbfs orthogonality-basis
behavior against the reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optiland_tpu.geometry import forbes as F
from optiland_tpu.geometry import nurbs as NB


class TestNurbsBasisGoldens:
    def setup_method(self):
        self.p = 3
        self.n = 7
        self.U = NB.clamped_uniform_knots(self.n, self.p)

    def test_knot_vector_structure(self):
        U = self.U
        assert len(U) == self.n + self.p + 1
        np.testing.assert_array_equal(U[: self.p + 1], U[0])
        np.testing.assert_array_equal(U[-(self.p + 1):], U[-1])
        assert np.all(np.diff(U) >= 0)

    def test_partition_of_unity(self):
        ts = np.linspace(self.U[0], self.U[-1] - 1e-9, 50)
        for t in ts:
            span = int(np.asarray(NB.find_span(jnp.asarray(self.U), self.p,
                                               self.n, t)))
            Nvals = np.asarray(NB.basis_funs(jnp.asarray(self.U), self.p,
                                             span, t))
            np.testing.assert_allclose(Nvals.sum(), 1.0, rtol=1e-12)
            assert np.all(Nvals >= -1e-14)

    def test_endpoint_interpolation(self):
        # clamped curve passes through the first/last control point
        coeffs = np.arange(self.n, dtype=float)
        v0 = NB._deboor_np(self.U, self.p, self.n, coeffs, self.U[0])
        v1 = NB._deboor_np(self.U, self.p, self.n, coeffs,
                           self.U[-1] - 1e-12)
        np.testing.assert_allclose(v0, coeffs[0], atol=1e-9)
        np.testing.assert_allclose(v1, coeffs[-1], atol=1e-6)

    def test_basis_derivative_vs_finite_difference(self):
        t0 = 0.37
        span = int(np.asarray(NB.find_span(jnp.asarray(self.U), self.p,
                                           self.n, t0)))
        _, dN = (np.asarray(a) for a in NB.basis_and_deriv(
            jnp.asarray(self.U), self.p, span, t0))
        eps = 1e-6
        Np = np.asarray(NB.basis_funs(jnp.asarray(self.U), self.p, span,
                                      t0 + eps))
        Nm = np.asarray(NB.basis_funs(jnp.asarray(self.U), self.p, span,
                                      t0 - eps))
        np.testing.assert_allclose(dN, (Np - Nm) / (2 * eps), atol=1e-5)

    def test_linear_precision(self):
        """B-spline curve with Greville-abscissa control points reproduces
        the identity (linear precision — a classic spline property)."""
        g = NB.greville(self.U, self.p, self.n)
        for t in np.linspace(0.01, 0.99, 17):
            v = NB._deboor_np(self.U, self.p, self.n, g, t)
            np.testing.assert_allclose(v, t, atol=1e-10)

    def test_surface_fit_reproduces_sphere(self):
        from optiland_tpu.geometry.surfaces import _conic_sag

        cv, k = 1 / 40.0, -0.3

        def sag_np(X, Y):
            return np.asarray(_conic_sag(jnp.asarray(X), jnp.asarray(Y),
                                         cv, k))

        box = (-6.0, 6.0, -6.0, 6.0)
        U, V, W, Px, Py, Pz = NB.fit_nurbs_to_sag(sag_np, *box, 8, 8,
                                                  p=3, q=3)
        rng = np.random.default_rng(0)
        xs = rng.uniform(-5, 5, 40)
        ys = rng.uniform(-5, 5, 40)
        z, gx, gy = NB.sag_and_grad_xy(
            jnp.asarray(U), jnp.asarray(V), jnp.asarray(W),
            jnp.asarray(Px), jnp.asarray(Py), jnp.asarray(Pz),
            3, 3, 8, 8, box, jnp.asarray(xs), jnp.asarray(ys))
        np.testing.assert_allclose(np.asarray(z), sag_np(xs, ys), atol=2e-4)

    def test_basis_parity_vs_reference(self, reference):
        """Our nonzero-basis window matches the reference's full
        `compute_basis_polynomials` (all n basis values at u — ours are
        the p+1 nonzero ones at positions span-p..span)."""
        from optiland.geometries.nurbs.nurbs_basis_functions import (
            compute_basis_polynomials)

        U = self.U
        for t in (0.12, 0.5, 0.87):
            full = np.asarray(compute_basis_polynomials(
                self.n - 1, self.p, U, np.asarray([t]))).ravel()
            span = int(np.asarray(NB.find_span(jnp.asarray(U), self.p,
                                               self.n, t)))
            got = np.asarray(NB.basis_funs(jnp.asarray(U), self.p, span, t))
            want = full[span - self.p: span + 1]
            np.testing.assert_allclose(got, want, atol=1e-12)
            # everything outside the window is zero (local support)
            mask = np.ones(self.n, bool)
            mask[span - self.p: span + 1] = False
            np.testing.assert_allclose(full[mask], 0.0, atol=1e-12)


class TestForbesGoldens:
    def test_qbfs_zeroth_polynomial_is_constant(self):
        # Q_0^bfs(u^2) == 1 by construction of the normalization
        u2 = jnp.asarray(np.linspace(0.01, 0.99, 21))
        s = np.asarray(F.qbfs_sum([1.0], u2))
        np.testing.assert_allclose(s, s[0], rtol=1e-12)

    def test_qbfs_linearity_in_coefficients(self):
        u2 = jnp.asarray(np.linspace(0.05, 0.95, 13))
        a = np.asarray(F.qbfs_sum([1.0, 0.0, 0.0], u2))
        b = np.asarray(F.qbfs_sum([0.0, 1.0, 0.0], u2))
        ab = np.asarray(F.qbfs_sum([2.0, -3.0, 0.0], u2))
        np.testing.assert_allclose(ab, 2 * a - 3 * b, rtol=1e-10)

    def test_qbfs_sag_parity_vs_reference_dense(self, reference):
        from optiland.coordinate_system import CoordinateSystem
        from optiland.geometries.forbes import (ForbesQbfsGeometry,
                                                ForbesSurfaceConfig)

        from optiland_tpu.geometry import surfaces as G

        terms = {0: 2e-4, 1: -1e-4, 2: 5e-5, 3: -2e-5, 4: 1e-5}
        cfg = ForbesSurfaceConfig(radius=45.0, conic=-0.6, norm_radius=8.0,
                                  terms=terms)
        ref = ForbesQbfsGeometry(CoordinateSystem(), cfg)
        rng = np.random.default_rng(1)
        x = rng.uniform(-7.5, 7.5, 100)
        y = rng.uniform(-7.5, 7.5, 100)
        coeffs = np.array([8.0] + [terms[i] for i in range(5)])
        got = np.asarray(G.sag(G.GEOM_FORBES_QBFS, 6, jnp.asarray(x),
                               jnp.asarray(y), 1 / 45.0, -0.6,
                               jnp.asarray(coeffs)))
        np.testing.assert_allclose(got, np.asarray(ref.sag(x, y)),
                                   rtol=1e-9, atol=1e-12)

    def test_q2d_azimuthal_orders_parity(self, reference):
        from optiland.coordinate_system import CoordinateSystem
        from optiland.geometries.forbes import (ForbesQ2dGeometry,
                                                ForbesSurfaceConfig)

        from optiland_tpu.system.optic import Optic

        # reference key format: ("a"|"b", m, n) — cosine/sine harmonic
        terms = {("a", 0, 1): 1e-4, ("a", 1, 1): -5e-5, ("a", 2, 0): 2e-5,
                 ("b", 1, 1): 3e-5, ("b", 2, 2): -1e-5}
        cfg = ForbesSurfaceConfig(radius=60.0, conic=0.0, norm_radius=9.0,
                                  terms=terms)
        ref = ForbesQ2dGeometry(CoordinateSystem(), cfg)

        lens = Optic()
        lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
        lens.add_surface(index=1, radius=60.0, thickness=5.0, material=1.5,
                         is_stop=True, surface_type="forbes_q2d",
                         norm_radius=9.0, freeform_coeffs=terms)
        lens.add_surface(index=2, radius=np.inf, thickness=40.0)
        lens.add_surface(index=3)
        lens.set_aperture(aperture_type="EPD", value=10.0)
        lens.set_field_type("angle")
        lens.add_field(y=0)
        lens.add_wavelength(value=0.55, is_primary=True)
        static, params = lens.build()

        from optiland_tpu.geometry import surfaces as G

        rng = np.random.default_rng(3)
        x = rng.uniform(-8, 8, 60)
        y = rng.uniform(-8, 8, 60)
        got = np.asarray(G.sag(
            static.geom_codes[1], static.geom_n_coeffs[1], jnp.asarray(x),
            jnp.asarray(y), params.cv[1], params.conic[1],
            params.coeffs[1], aux=static.geom_aux[1]))
        np.testing.assert_allclose(got, np.asarray(ref.sag(x, y)),
                                   rtol=1e-9, atol=1e-12)

    def test_forbes_gradient_smooth_at_vertex(self):
        """Q2D harmonics are Cartesian polynomials in this implementation:
        no arctan2 singularity on-axis (kernel-critical property)."""
        from optiland_tpu.geometry import surfaces as G

        coeffs = jnp.asarray([9.0, 1e-4, -5e-5])
        g = jax.grad(lambda xx: G.sag(
            G.GEOM_FORBES_QBFS, 3, xx, 0.0, 1 / 60.0, 0.0, coeffs))(0.0)
        assert np.isfinite(float(g))
